#!/usr/bin/env python3
"""Full-surface NULL-regeneration sweep: rebuild the sf0.001 fixtures WITH
NULL text / NULL embeddings / NULL event_type / NULL ts, then run EVERY
oracle-paired query through the hash-exact Spark-vs-DuckDB comparison.

The shipped fixtures carry zero NULL rows, so the per-round driver gate can
never see a NULL-semantics divergence; this sweep is how round 8 found (and
closed) 16 of them — including DuckDB 1.0's nondeterministic parallel
window executor on NULL-bearing input. The fast subset runs in pytest
(tests/test_null_regeneration.py); this script is the exhaustive form.

Usage: python3 scripts/null_sweep.py   (expect: DONE 149/149 green)
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_lib import SRC, run_sweep

# Round-9 audit (VERDICT r8 ask #5): every oracle ranking-window site
# (ROW_NUMBER/RANK/DENSE_RANK/NTILE/LAG/LEAD/FIRST_VALUE/LAST_VALUE/
# PERCENT_RANK/CUME_DIST ... OVER) was enumerated — 29 oracles total.
# DuckDB 1.0's parallel window executor is nondeterministic when the
# window's input carries NULL partition/order rows, so every one of the
# 29 that reads a NULL-injected table (documents / embeddings / events)
# is repeated 3x here instead of once. The 4 unexposed ones
# (window_distribution_functions, window_positional_values,
# window_running_spend, window_topk_orders_per_customer) read only
# TPC-H tables whose partition/order columns are non-NULL by fixture
# construction and are untouched by build_null_corpus.
REPEAT_3X = frozenset([
    "agg_cms_heavy_hitters", "agg_mode_per_group",
    "dedup_cluster_representatives", "dedup_semantic_semdedup",
    "events_funnel_sessionized", "events_session_transitions",
    "llm_corpus_pipeline", "sample_deterministic_stratified",
    "sample_global_shuffle", "sample_source_cap",
    "sim_ann_lsh_topk", "sim_ann_multiprobe_topk", "sim_ann_recall_at_k",
    "sim_cosine_topk_bruteforce", "sim_decontaminate_embeddings",
    "sim_ivf_recall_at_k", "sim_label_centroid_outliers",
    "sim_pq_recall_at_k", "stream_first_event_per_key",
    "stream_session_windows", "text_bm25_topk", "text_hybrid_rrf_search",
    "text_tfidf_top_terms", "text_token_rarity_score",
    "window_sessionize_events",
])


def build_null_corpus(dst: str) -> None:
    for f in os.listdir(SRC):
        shutil.copy(os.path.join(SRC, f), dst)
    docs = pd.read_parquet(os.path.join(dst, "documents.parquet"))
    docs.loc[docs["doc_id"] == 7, "text"] = None     # historical no-content doc
    docs.loc[docs["doc_id"] == 301, "text"] = None   # new-batch no-content doc
    # NULL GROUP KEYS (round 9): a missing source/lang must form its own
    # group everywhere, not silently vanish — the token-budget re-join was
    # dropping every NULL-group document while the oracle's PARTITION BY
    # kept them
    docs.loc[docs["doc_id"] == 11, "source"] = None
    docs.loc[docs["doc_id"] == 13, "lang"] = None
    extra = pd.DataFrame(
        {"doc_id": [10001, 10002], "text": [None, None],
         "lang": ["en", "de"], "source": ["src0", "src1"], "n_chars": [0, 0]}
    ).astype(docs.dtypes.to_dict())
    pd.concat([docs, extra], ignore_index=True).to_parquet(
        os.path.join(dst, "documents.parquet"), index=False
    )
    emb = pd.read_parquet(os.path.join(dst, "embeddings.parquet"))
    emb.loc[emb["vec_id"] == 50, "embedding"] = None  # failed-encoder row
    # element-level NULL (one failed DIMENSION, not a failed row) on a
    # vec_id inside every id-range filter — np.float32 scalars keep the
    # column list<float>; a python-float list would promote it to double
    i2 = emb.index[emb["vec_id"] == 2][0]
    emb.at[i2, "embedding"] = [
        None if j == 3 else v for j, v in enumerate(emb.at[i2, "embedding"])
    ]
    emb.to_parquet(os.path.join(dst, "embeddings.parquet"), index=False)
    ev = pd.read_parquet(os.path.join(dst, "events.parquet"))
    ev.loc[ev.index[:3], "event_type"] = None  # failed-parse events
    ev.loc[ev.index[3:5], "ts"] = pd.NaT       # clockless events
    ev.to_parquet(os.path.join(dst, "events.parquet"), index=False)


def main() -> None:
    run_sweep(build_null_corpus, "null_sweep_", "NULL", repeat_3x=REPEAT_3X)


if __name__ == "__main__":
    main()
