#!/usr/bin/env python3
"""Corpus retrieval + frequency analytics — the round-5 operators composed:

1. BM25 keyword search over `documents` (operators/text.bm25_topk)
2. Count-Min heavy hitters for the corpus vocabulary (the sketch the search
   layer would use to pick stop-words / trending terms at 100 TB)
3. Bigram-LM fluency scoring to rank the hits by language quality
4. Incremental near-dup to show a result set deduped against the corpus

Run: python3 examples/search_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.dedup import minhash_lsh_incremental
from crystal_parquet_database_spark.operators.text import bigram_fluency, bm25_topk
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import QUERIES
from crystal_parquet_database_spark.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="search_corpus")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # 1. search
    hits = bm25_topk(
        docs, "text", "doc_id",
        {"q_spark": ["spark", "batch"], "q_sort": ["merge", "sort"]},
        top_k=5,
    )
    print("BM25 top hits per query:")
    hits.orderBy("query_id", "rank").show(10, truncate=60)

    # 2. heavy hitters (runs the registered, oracle-checked query)
    print("Corpus heavy hitters (CMS estimate vs exact):")
    QUERIES["agg_cms_heavy_hitters"](spark, sf_dir).orderBy(
        F.desc("exact_n")
    ).show(10)

    # 3. rank the search hits by bigram-LM fluency
    scored = hits.join(bigram_fluency(docs, "text", "doc_id"), "doc_id").select(
        "query_id", "rank", "doc_id", "score", "fluency", "novel_ratio"
    )
    print("Hits with LM-fluency scores:")
    scored.orderBy("query_id", "rank").show(10)

    # 4. dedup a "new batch" (doc_id % 10 == 0) against the corpus
    pairs = minhash_lsh_incremental(
        docs.filter("doc_id % 10 = 0"),
        docs.filter("doc_id % 10 <> 0"),
        "text", "doc_id", threshold=0.8,
    )
    n = pairs.count()
    print(f"incremental near-dup pairs (new batch vs corpus): {n}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
