#!/usr/bin/env python3
"""Warm-time named queries at sf0.1 (one cold + one warm pass each, warm
printed) — the ranking input for the verification window's 'heaviest plans
first' ordering. Not a benchmark: one rep, engine session, no pinning.

Usage: python3 scripts/time_queries.py <query>...
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crystal_parquet_database_spark.runtime import release_all_session_blocks
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import QUERIES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")
    spark = get_spark(app_name="time_queries")
    out = {}
    for name in names:
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        release_all_session_blocks(spark)
        gc.collect()
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        out[name] = time.perf_counter() - t0
        release_all_session_blocks(spark)
        gc.collect()
    for n, v in sorted(out.items(), key=lambda t: -t[1]):
        print(f"{v:8.3f}  {n}")


if __name__ == "__main__":
    main()
