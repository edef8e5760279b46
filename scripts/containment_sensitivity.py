#!/usr/bin/env python3
"""Containment-cap sensitivity: how does ``max_df`` (the stop-shingle
document-frequency cap in operators/dedup.containment_pairs) trade
candidate-pair fan-out (= runtime) against pairs found (= recall)?

The 10× scale probe showed dedup_containment_pairs scaling 2.6× — candidate
growth under max_df=100. This measures the knob: for each max_df, run the
operator fresh on the sf0.1 documents table and record (pairs found, pairs
at threshold per direction, candidate-pair count before thresholding,
wall-clock). Results are appended to SCALE.md §outliers by hand.

Usage: python3 scripts/containment_sensitivity.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators import dedup as D
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MAX_DFS = [20, 50, 100, 200]
THRESHOLD = 0.8
K = 3


def main() -> None:
    spark = get_spark(app_name="containment_sensitivity")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint(eager=True)  # take IO out of the measurement

    # warm-up pass (discarded): JVM/codegen warm-up otherwise lands entirely
    # on the first measured cap and skews the comparison
    D.containment_pairs(
        docs, "text", "doc_id", threshold=THRESHOLD, k=K, max_df=100
    ).count()

    results = []
    for max_df in MAX_DFS:
        t0 = time.monotonic()
        pairs = D.containment_pairs(
            docs, "text", "doc_id", threshold=THRESHOLD, k=K, max_df=max_df
        )
        by_dir = {
            r["direction"]: r["n"]
            for r in pairs.groupBy("direction").agg(F.count("*").alias("n")).collect()
        }
        wall = time.monotonic() - t0
        n_pairs = sum(by_dir.values())
        results.append(
            {
                "max_df": max_df,
                "pairs_found": n_pairs,
                "by_direction": by_dir,
                "wall_s": round(wall, 2),
            }
        )
        print(json.dumps(results[-1]))

    base = next(r for r in results if r["max_df"] == 100)
    print("\nSummary vs max_df=100 (the shipped default):")
    for r in results:
        rec = r["pairs_found"] / base["pairs_found"] if base["pairs_found"] else float("nan")
        spd = base["wall_s"] / r["wall_s"] if r["wall_s"] else float("nan")
        print(
            f"  max_df={r['max_df']:>4}: pairs={r['pairs_found']:>6} "
            f"({rec:5.1%} of default) wall={r['wall_s']:>6.2f}s "
            f"({spd:4.2f}x speed of default)"
        )


if __name__ == "__main__":
    main()
