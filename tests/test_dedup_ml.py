"""Spark-ML MinHashLSH variant vs the native exact pipeline: candidates the
ML path emits must be true near-dups, and recall on the planted high-Jaccard
pairs must be high (seeded, so this is deterministic)."""

from __future__ import annotations

from crystal_parquet_database_spark.operators.dedup import (
    minhash_lsh_ml,
    ngram_jaccard_pairs,
)
from crystal_parquet_database_spark.tables import load_table


def test_ml_lsh_agrees_with_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.8).collect()
    }
    ml = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_ml(docs, "text", "doc_id", threshold=0.8).collect()
    }
    assert ml <= exact  # approxSimilarityJoin verifies exact distance → no false positives
    assert exact  # fixture has planted near-dups
    recall = len(ml & exact) / len(exact)
    assert recall >= 0.9
