"""UDF-surface equivalence: the pandas_udf quality scorer must agree with the
pure-expression version (same formula, different execution path)."""

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.text import (
    quality_features,
    quality_score_pandas_udf,
)
from crystal_parquet_database_spark.tables import load_table

STOPWORDS = ["the", "a", "key", "value", "of", "and"]


def test_pandas_udf_matches_expression_scorer(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    # adversarial rows: null, empty, whitespace-only, non-ASCII whitespace,
    # punctuation-heavy — the cases where Python and JVM semantics diverge
    # unless carefully mirrored
    edge = spark.createDataFrame(
        [
            (100001, None),
            (100002, ""),
            (100003, "   "),
            (100004, "a b the c"),
            (100005, "!!! ??? ... a"),
            (100006, "a b the\tc"),  # NBSP (non-ASCII ws) + tab
        ],
        schema="doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    expr = quality_features(docs, "text", STOPWORDS).select("doc_id", "quality_score")
    udf = quality_score_pandas_udf(docs, "text", STOPWORDS).select(
        "doc_id", F.col("quality_score_udf").alias("quality_score")
    )
    a = {r["doc_id"]: r["quality_score"] for r in expr.collect()}
    b = {r["doc_id"]: r["quality_score"] for r in udf.collect()}
    assert a.keys() == b.keys()
    for k in a:
        if a[k] is None or b[k] is None:
            assert a[k] is None and b[k] is None
        else:
            assert abs(a[k] - b[k]) < 1e-12, (k, a[k], b[k])


def test_repetition_features_known_values(spark):
    from crystal_parquet_database_spark.operators.text import repetition_features

    rows = [
        (1, "a a a a"),          # 4 words, 1 distinct; bigrams: 3 total 1 distinct
        (2, "a b c d"),          # no repetition
        (3, "x y x y x"),        # bigrams: "x y","y x","x y","y x" -> 2/4 dup
        (4, ""),                 # split('') -> [''] : 1 word, no n-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df, "text", "doc_id").collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["dup_bigram_frac"] == 1.0 - 1.0 / 3.0
    assert got[1]["top_word_frac"] == 1.0
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[2]["top_word_frac"] == 0.25
    assert got[3]["dup_bigram_frac"] == 0.5
    assert got[3]["top_word_frac"] == 3.0 / 5.0
    assert got[4]["n_words"] == 1
    assert got[4]["dup_bigram_frac"] == 0.0 and got[4]["dup_trigram_frac"] == 0.0
