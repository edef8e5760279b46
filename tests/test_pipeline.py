"""End-to-end training-data pipeline: dedup → filters → sample → write."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.pipeline import TrainingDataPipeline
from crystal_parquet_database_spark.tables import load_table


def test_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = (
        TrainingDataPipeline(docs)
        .dedup_exact()
        .dedup_near(threshold=0.8)
        .filter_length(min_tokens=10)
        .filter_quality(min_score=0.2)
        .sample_fraction(80)
    )
    stats = p.describe()
    names = [s[0] for s in stats]
    counts = [s[1] for s in stats]
    assert names[0] == "source" and counts[0] == 500
    # monotone: every step can only shrink the corpus
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    # near-dedup removed the planted near-duplicates
    assert counts[2] < counts[1]
    assert counts[-1] > 0

    out = str(tmp_path / "clean")
    p.write(out, max_records_per_file=100, n_files=1)
    back = spark.read.parquet(out)
    assert back.count() == counts[-1]
    assert glob.glob(f"{out}/*.parquet")
    # schema preserved (pipeline drops its own helper columns)
    assert set(back.columns) == set(docs.columns)


def test_pipeline_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def run():
        return sorted(
            r["doc_id"]
            for r in TrainingDataPipeline(docs)
            .dedup_near()
            .sample_fraction(50)
            .df.select("doc_id")
            .collect()
        )

    assert run() == run()


def test_pipeline_near_dedup_keeps_one_representative(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from crystal_parquet_database_spark.operators.dedup import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.8)
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    survivors = {
        r["doc_id"] for r in TrainingDataPipeline(docs).dedup_near().df.select("doc_id").collect()
    }
    for a, b in pair_rows:
        assert not (a in survivors and b in survivors)  # at most one side survives
        assert a in survivors or b not in survivors  # losers are the higher ids


def test_pipeline_full_pretraining_chain(spark, sf_dir, tmp_path):
    """The complete pretraining shape: dedup → decontaminate → quality →
    mixture → split → pack → write."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    p = (
        TrainingDataPipeline(corpus)
        .dedup_exact()
        .decontaminate(ev)
        .filter_quality(min_score=0.2)
        .mixture({"en": 1.0, "de": 0.5})
        .with_split()
        .with_packing(capacity=256)
    )
    out = str(tmp_path / "packed")
    p.write(out, partition_by=["split"])
    back = spark.read.parquet(out)
    assert {"doc_id", "text", "split", "bin_id", "bin_offset"} <= set(back.columns)
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # packing is dense: bins are contiguous from 0
    n_bins = back.agg(F.max("bin_id")).first()[0]
    assert back.select("bin_id").distinct().count() == n_bins + 1
    # deterministic end to end
    stats1 = p.describe()
    assert [s[1] for s in stats1] == [s[1] for s in p.describe()]


def test_mixture_threshold_rounds_half_up():
    """Round-9 advice: round() is banker's rounding — an exact .5 product
    (0.00025 * 10000 == 2.5) went to the EVEN neighbor 2, i.e. truncated,
    the exact surprise the round-not-int comment promised to avoid."""
    from crystal_parquet_database_spark.operators.pipeline import _mixture_threshold

    assert _mixture_threshold(0.00025, 10_000) == 3   # round() gave 2
    assert _mixture_threshold(0.29, 10_000) == 2900   # int() gave 2899
    assert _mixture_threshold(0.5, 10_000) == 5000    # exact rates stay exact
    # float error can land just BELOW .5 too: 0.00015*10000 ==
    # 1.4999999999999998, where a bare int(x + 0.5) truncated to 1
    assert _mixture_threshold(0.00015, 10_000) == 2
    assert _mixture_threshold(0.00142, 10_000) == 14  # true sub-half stays down


def test_sample_fraction_rejects_fraction_like_input(spark):
    from crystal_parquet_database_spark.operators.pipeline import TrainingDataPipeline

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    p = TrainingDataPipeline(df)
    with pytest.raises(ValueError, match="FRACTION"):
        p.sample_fraction(0.1)  # caller meant 10%


def test_filter_quality_empty_stopwords_not_replaced(spark):
    """`stopwords=[]` means score WITHOUT stopwords; the old `or` idiom
    silently substituted the default list."""
    from crystal_parquet_database_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "the the the the of of and and")], "doc_id long, text string"
    )
    with_default = T.quality_features(df, "text", ["the", "of", "and"]).collect()[0]
    with_empty = T.quality_features(df, "text", []).collect()[0]
    assert with_default["stopword_ratio"] > 0
    assert with_empty["stopword_ratio"] == 0  # empty list respected
