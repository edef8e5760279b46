"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $PLANS_ROUND, default r15).

Usage: python scripts/capture_plans.py <suffix> [name ...]
Writes plans/<round>/<query>_<suffix>.txt for each named query (default: every
bench HEADLINE query). Plan generation is driver-side; queries whose
construction runs eager jobs (trained codebooks) will execute those, so this
is not a timing tool — it exists so the optimization round's plan claims are
checkable without running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import HEADLINE  # noqa: E402
from crystal_parquet_database_spark.session import get_spark  # noqa: E402
from crystal_parquet_database_spark.surface import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "plans",
        os.environ.get("PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"captured {name}_{suffix}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
