#!/usr/bin/env python3
"""Extreme-values sweep: rebuild the sf0.001 fixtures with the numeric and
temporal edge values a 100 TB feed eventually contains — NaN, ±inf,
negative zero, 1e308-magnitude and denormal doubles in event values;
epoch-start and far-future timestamps; one giant document (100k chars) and
metadata outliers — then run EVERY oracle-paired query through the
hash-exact Spark-vs-DuckDB comparison.

Targets the cross-engine numeric-semantics divergence class the other
sweeps cannot see: Spark orders NaN LAST and treats NaN = NaN in
aggregation/grouping while engines differ on NaN vs NULL in min/max and
avg; -0.0 vs 0.0 may or may not be normalized in group keys and sums;
double overflow to inf differs from decimal abort; timestamp arithmetic at
the epoch boundary exercises signed-vs-unsigned bucket math (a pre-1970
window start breaks integer-division bucketing that assumes positive
epochs).

Usage: python3 scripts/extreme_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lib import SRC, run_sweep


def build_extreme_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)

    ev = pd.read_parquet(os.path.join(dst, "events.parquet"))
    # numeric edges in the measure column (id-keyed so it's deterministic)
    ev.loc[ev["event_id"] % 50 == 1, "value"] = float("nan")
    ev.loc[ev["event_id"] % 50 == 2, "value"] = float("inf")
    ev.loc[ev["event_id"] % 50 == 3, "value"] = float("-inf")
    ev.loc[ev["event_id"] % 50 == 4, "value"] = -0.0
    ev.loc[ev["event_id"] % 50 == 5, "value"] = 1.7e308
    ev.loc[ev["event_id"] % 50 == 6, "value"] = 5e-324  # smallest denormal
    ev.loc[ev["event_id"] % 50 == 7, "value"] = -1.7e308
    # in the histogram's bucketable range but with bucket*width > INT32:
    # the decade the first extreme grid skipped, where an int32 bucket_low
    # multiply ANSI-aborted BOTH engines (round-9 review finding)
    ev.loc[ev["event_id"] % 50 == 8, "value"] = 3e9
    ev.loc[ev["event_id"] % 50 == 9, "value"] = -3e9
    # temporal edges: a few events at the epoch start and far future (time
    # windows, sessionization and date_trunc must agree across engines at
    # both extremes)
    ev.loc[ev["event_id"] % 97 == 11, "ts"] = pd.Timestamp("1970-01-01 00:00:00")
    ev.loc[ev["event_id"] % 97 == 23, "ts"] = pd.Timestamp("2200-06-15 23:59:59")
    ev.to_parquet(os.path.join(dst, "events.parquet"), index=False)

    docs = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    # one giant document: 100k chars with enough internal repetition AND
    # variety to exercise shingles/chunks/packing at row-explosion scale
    giant = " ".join(
        f"tok{i % 733} scan merge window batch" for i in range(14000)
    )[:100_000]
    gi = docs.index[docs["doc_id"] == 42][0]
    docs.loc[gi, "text"] = giant
    docs.loc[gi, "n_chars"] = len(giant)
    # metadata outlier: a doc whose stored n_chars is enormous (scrape
    # metadata lies sometimes; budget/packing math must not overflow)
    docs.loc[docs["doc_id"] == 77, "n_chars"] = 2_000_000_000
    docs.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    emb = pd.read_parquet(os.path.join(dst, "embeddings.parquet"))
    # a zero vector (norm 0 — cosine must not divide by zero) and a
    # huge-magnitude vector (norm overflow territory in naive float32)
    z = emb.index[emb["vec_id"] == 7][0]
    emb.at[z, "embedding"] = np.zeros(64, dtype=np.float32)
    h = emb.index[emb["vec_id"] == 9][0]
    emb.at[h, "embedding"] = np.full(64, 1e18, dtype=np.float32)
    emb.to_parquet(os.path.join(dst, "embeddings.parquet"), index=False)


def main() -> None:
    run_sweep(build_extreme_corpus, 'extreme_sweep_', 'EXTREME')


if __name__ == "__main__":
    main()
