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

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lib import SRC, run_sweep


def build_empty_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 0), os.path.join(dst, f))


def main() -> None:
    run_sweep(build_empty_corpus, 'empty_sweep_', 'EMPTY')


if __name__ == "__main__":
    main()
