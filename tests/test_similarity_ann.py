"""ANN quality gates: approximate paths (hyperplane-LSH, IVF) must recover
most of the exact brute-force top-k on the fixture embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
)
from crystal_parquet_database_spark.tables import load_table


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["match_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = _topk_sets(cosine_topk(q, emb, "vec_id", "embedding", k=10))
    approx = _topk_sets(
        ivf_topk(q, emb, "vec_id", "embedding", k=10, n_cells=16, n_probe=8)
    )
    recalls = [len(exact[qid] & approx.get(qid, set())) / 10 for qid in exact]
    assert sum(recalls) / len(recalls) >= 0.5  # n_probe=8/16 cells → decent recall


def test_ivf_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, ivf_topk(q, emb, "vec_id", "embedding", k=5).select("query_id", "match_id", "rank").collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, "vec_id", "embedding", k=5).select("query_id", "match_id", "rank").collect()))
    assert a == b


def test_lsh_returns_bucket_constrained_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    res = ann_lsh_topk(q, emb, "vec_id", "embedding", k=10)
    got = _topk_sets(res)
    assert got and all(len(v) <= 10 for v in got.values())
