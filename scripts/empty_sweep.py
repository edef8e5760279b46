#!/usr/bin/env python3
"""Empty-corpus sweep: schema-preserving ZERO-ROW versions of every fixture
table, then every oracle-paired query through the hash-exact comparison.

Catches the boundary-condition class no populated fixture can show:
driver-side crashes (collect()[0] / IndexError on pinned codebooks,
zero-arm expression trees that fail analysis), ANSI divide-by-zero in
sketch-bound checks, and the one real ENGINE divergence — ANSI/DuckDB emit
the grand-total grouping-set row over an empty relation while Spark's
rollup/cube/grouping-sets emit nothing (pinned via HAVING COUNT(*) > 0,
value-identical on any populated input).

Usage: python3 scripts/empty_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import tempfile

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crystal_parquet_database_spark.runtime import release_all_session_blocks
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import ORACLES
from crystal_parquet_database_spark.testing import compare_query

SRC = "/root/testdata/sf0.001"


def build_empty_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 0), os.path.join(dst, f))


def main() -> None:
    dst = tempfile.mkdtemp(prefix="empty_sweep_")
    build_empty_corpus(dst)
    spark = get_spark()
    fails = []
    for name in ORACLES:
        try:
            ok, msg = compare_query(spark, name, dst)
        except Exception as e:
            ok, msg = False, f"{name}: EXC {type(e).__name__}: {str(e)[:160]}"
        if not ok:
            fails.append(msg.splitlines()[0][:200])
            print("FAIL", fails[-1], flush=True)
        release_all_session_blocks(spark)
        gc.collect()
    print(f"DONE {len(ORACLES) - len(fails)}/{len(ORACLES)} green on EMPTY corpus; dir={dst}")
    if fails:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
