#!/usr/bin/env python3
"""Edit-distance banding sensitivity: how do ``block_w`` (block width — the
pigeonhole budget) and ``max_df`` (the hot-block cap) trade candidate
fan-out (= runtime) against TRUE pairs found (= recall), ground-truthed
against the DuckDB brute force at the same max_dist?

Round 11's knob history: the first (head-length-bucket) candidate
generator degenerated to all-pairs on the 10× replica (truncated heads all
share one length); the block-banding replacement then measured 416k
candidates from 5 000 docs uncapped on the low-entropy fixture vocabulary.
This script reproduces the measurement that picked the shipped default
(block_w=8, max_df=32): recall 1.00 on every ground-truth pair at ~6×
less wall than the uncapped 6-char blocks. Results feed SCALE.md §"Dedup
at corpus scale" by hand.

Usage: python3 scripts/edit_distance_sensitivity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from crystal_parquet_database_spark.operators import dedup as D
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.tables import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MAX_DIST, HEAD_LEN = 7, 48
GRID = [(6, 64), (6, 16), (8, 32), (8, 16), (12, 64), (12, 16)]


def main() -> None:
    spark = get_spark(app_name="edit_distance_sensitivity")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")

    con = duckdb.connect()
    truth = set(
        map(
            tuple,
            con.execute(
                f"""
        WITH d AS (
          SELECT doc_id, substr(trim(text, ' '), 1, {HEAD_LEN}) AS h
          FROM read_parquet('{SF_DIR}/documents.parquet')
          WHERE text IS NOT NULL AND strlen(text) = length(text)
        )
        SELECT a.doc_id, b.doc_id FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE abs(length(a.h) - length(b.h)) <= {MAX_DIST}
          AND levenshtein(a.h, b.h) <= {MAX_DIST}
        """
            ).fetchall(),
        )
    )
    print(f"ground-truth pairs (brute force, dist <= {MAX_DIST}): {len(truth)}")
    print(f"{'block_w':>7} {'max_df':>6} {'pairs':>6} {'recall':>6} {'warm s':>7}")
    for bw, df in GRID:
        # warm-up pass (plan + JIT), then the timed pass — the operator is
        # deterministic so the second pass computes the identical result
        def run():
            return D.edit_distance_near_dup_pairs(
                docs, "doc_id", "text",
                max_dist=MAX_DIST, head_len=HEAD_LEN, block_w=bw, max_df=df,
            )

        run().write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        got = {(r["id_a"], r["id_b"]) for r in run().collect()}
        dt = time.perf_counter() - t0
        rec = len(got & truth) / max(len(truth), 1)
        print(f"{bw:>7} {df:>6} {len(got):>6} {rec:>6.2f} {dt:>7.2f}")


if __name__ == "__main__":
    main()
