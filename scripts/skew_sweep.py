#!/usr/bin/env python3
"""Heavy-skew sweep: rebuild the sf0.001 fixtures with the hot-key shapes a
100 TB scrape-derived corpus actually has, then run EVERY oracle-paired
query through the hash-exact Spark-vs-DuckDB comparison.

The shipped fixtures are uniformly distributed, so neither the driver gate
nor the NULL/empty sweeps can see what a dominant key does to query
SEMANTICS: massive tie groups (one text body shared by 30% of documents,
one embedding shared by 30% of vectors) stress every rank/top-k tie-break;
a single user owning 60% of events stresses sessionize/window partitions; a
hot lang/source stresses stratified sampling and partition-keyed layouts; a
hot customer stresses the join cardinality paths. Any hash mismatch here is
a real cross-engine divergence (both engines read the same corpus) — the
class that silently reorders results when real data is Zipfian.

This is a CORRECTNESS sweep, not a performance probe (scripts/scale_probe.py
owns the does-skew-blow-up-wall-clock question).

Usage: python3 scripts/skew_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lib import SRC, run_sweep

HOT_USER = 13        # owns 60% of events
HOT_TEXT_LO, HOT_TEXT_HI = 100, 250  # doc_ids sharing ONE text body (30%)
HOT_VEC_LO, HOT_VEC_HI = 100, 250    # vec_ids sharing ONE embedding (30%)


def build_skew_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)

    docs = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    hot = (docs["doc_id"] >= HOT_TEXT_LO) & (docs["doc_id"] < HOT_TEXT_HI)
    hot_text = docs.loc[docs["doc_id"] == HOT_TEXT_LO, "text"].iloc[0]
    docs.loc[hot, "text"] = hot_text
    docs.loc[hot, "n_chars"] = len(hot_text)
    docs.loc[docs["doc_id"] % 10 < 7, "lang"] = "en"    # 70% one language
    docs.loc[docs["doc_id"] % 2 == 0, "source"] = "src0"  # 50% one source
    docs.to_parquet(os.path.join(dst, "documents.parquet"), index=False)

    emb = pd.read_parquet(os.path.join(dst, "embeddings.parquet"))
    hot_vec = emb.loc[emb["vec_id"] == HOT_VEC_LO, "embedding"].iloc[0]
    hv = (emb["vec_id"] >= HOT_VEC_LO) & (emb["vec_id"] < HOT_VEC_HI)
    emb.loc[hv, "embedding"] = pd.Series([np.array(hot_vec)] * int(hv.sum()), index=emb.index[hv])
    emb.loc[emb["vec_id"] % 10 < 7, "label"] = np.int32(3)  # 70% one label
    emb.to_parquet(os.path.join(dst, "embeddings.parquet"), index=False)

    ev = pd.read_parquet(os.path.join(dst, "events.parquet"))
    ev.loc[ev["event_id"] % 10 < 6, "user_id"] = HOT_USER   # 60% one user
    ev.loc[ev["event_id"] % 2 == 0, "event_type"] = "view"  # 50% one type
    # 30% of events collapse into ONE minute (hot time bucket for every
    # tumbling/sliding/session window), spread over distinct microseconds
    # so event identity stays unique
    burst = ev["event_id"] % 10 >= 7
    base_ts = pd.Timestamp("2024-01-02 12:00:00")
    ev.loc[burst, "ts"] = base_ts + pd.to_timedelta(
        ev.loc[burst, "event_id"] % 60_000_000, unit="us"
    )
    ev.loc[ev["event_id"] % 5 == 0, "value"] = 42.0  # 20% tied values
    ev.to_parquet(os.path.join(dst, "events.parquet"), index=False)

    orders = pd.read_parquet(os.path.join(dst, "orders.parquet"))
    hot_cust = orders["o_custkey"].iloc[0]
    orders.loc[orders["o_orderkey"] % 5 < 2, "o_custkey"] = hot_cust  # 40% one customer
    orders.to_parquet(os.path.join(dst, "orders.parquet"), index=False)


def main() -> None:
    run_sweep(build_skew_corpus, 'skew_sweep_', 'SKEW')


if __name__ == "__main__":
    main()
