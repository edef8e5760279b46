"""Shared runner for the adversarial-corpus sweeps (null/empty/skew/
unicode/extreme): build a fixture variant, hash-compare EVERY oracle-paired
query, exit non-zero on any mismatch.

One definition of the per-query loop on purpose: the release-BEFORE-
failure-handling discipline (a failing query's eager-localCheckpoint blocks
would otherwise stay pinned for the rest of the 149-query run — gc alone
cannot free them, and leaked blocks turn one real divergence into
cascading slowdowns) must not live in five drifting copies."""

from __future__ import annotations

import gc
import os
import sys
import tempfile
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crystal_parquet_database_spark.runtime import release_all_session_blocks
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import ORACLES
from crystal_parquet_database_spark.testing import compare_query

SRC = "/root/testdata/sf0.001"


def run_sweep(
    build_corpus: Callable[[str], None],
    prefix: str,
    banner: str,
    repeat_3x: frozenset[str] = frozenset(),
) -> None:
    """Build the corpus into a fresh tmp dir, compare every oracle-paired
    query (``repeat_3x`` members 3×: DuckDB's parallel window executor is
    nondeterministic on NULL-bearing input, so a lucky single run can hide
    an intermittent split), print the DONE line, exit 1 on any failure."""
    dst = tempfile.mkdtemp(prefix=prefix)
    build_corpus(dst)
    spark = get_spark()
    fails = []
    # SWEEP_ONLY=a,b,c: restrict to named queries — the targeted mid-round
    # mode for stressing a new query against an adversarial corpus without
    # the full 8-minute pass. The end-of-round gate runs WITHOUT it.
    only = {
        n.strip()
        for n in os.environ.get("SWEEP_ONLY", "").split(",")
        if n.strip()
    }
    todo = [n for n in ORACLES if not only or n in only]
    for name in todo:
        reps = 3 if name in repeat_3x else 1
        for rep in range(reps):
            try:
                ok, msg = compare_query(spark, name, dst)
            except Exception as e:  # surface, don't abort the sweep
                ok, msg = False, f"{name}: EXC {type(e).__name__}: {e}"
            finally:
                release_all_session_blocks(spark)
                gc.collect()
            if not ok:
                tag = f" (rep {rep + 1}/{reps})" if reps > 1 else ""
                fails.append(msg.splitlines()[0][:200] + tag)
                print("FAIL", fails[-1], flush=True)
                break
    print(
        f"DONE {len(todo) - len(fails)}/{len(todo)} green on {banner} corpus; dir={dst}"
    )
    if fails:
        raise SystemExit(1)
