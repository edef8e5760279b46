#!/usr/bin/env python3
"""End-to-end LLM training-corpus curation over the fixture tables — the
operator families a 100 TB data pipeline chains, run at example scale:

    documents ── exact dedup ─ near-dup (MinHash-LSH) ─ quality classifier
              ─ language mix ─ token budget ─ packed sequences
    embeddings ─ SemDeDup ─ decontamination vs an eval set

Every stage is one of the registered surface queries / operators, so each is
individually oracle-checked elsewhere; this script shows how they compose as
one lazy Catalyst pipeline for a real user.

Run: python3 examples/curate_training_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators import dedup as D
from crystal_parquet_database_spark.operators import similarity as S
from crystal_parquet_database_spark.operators.text import quality_classifier_score
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import QUERIES
from crystal_parquet_database_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curate_corpus")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n0 = docs.count()

    # 1. exact dedup: keep the first doc of every byte-identical group
    kept = D.exact_dedup(docs, "text", "doc_id").filter(~F.col("is_dup"))
    docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")

    # 2. near-dup: MinHash-LSH candidate pairs → connected components →
    #    keep each cluster's representative (min doc_id)
    pairs = D.minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.8)
    comp = D.connected_components(
        pairs.select("id_a", "id_b"), docs.select("doc_id"), "doc_id"
    )
    docs = (
        docs.join(comp, "doc_id")
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .drop("cluster_id")
    )

    # 3. model-scored quality gate (hashed linear classifier)
    scores = quality_classifier_score(docs, "text", "doc_id")
    docs = docs.join(
        scores.filter(F.col("quality_label") == "keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )

    n_docs = docs.count()

    # 4. semantic dedup on the embedding side (SemDeDup)
    seeds = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 208)).select(
        (F.col("vec_id") - 200).cast("int").alias("cell_id"),
        F.col("embedding").alias("cvec"),
    )
    sem = S.semdedup(emb, "vec_id", "embedding", seeds, threshold=0.4)
    n_sem_removed = sem.filter("is_removed").count()

    # 5. the composed registered pipeline (dedup → quality → cap → budget)
    #    with per-doc stage labels — the auditable one-plan form
    audit = QUERIES["llm_corpus_pipeline"](spark, sf_dir)
    label_counts = {r["status"]: r["n"] for r in
                    audit.groupBy("status").agg(F.count("*").alias("n")).collect()}

    print(f"documents in: {n0}")
    print(f"after exact+near-dup+quality: {n_docs}")
    print(f"SemDeDup would remove {n_sem_removed} embeddings")
    print(f"registered-pipeline stage labels: {label_counts}")


if __name__ == "__main__":
    main()
