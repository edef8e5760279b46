#!/usr/bin/env python3
"""Adversarial-corpus sweep AT REPLICA SCALE (round-9 verdict ask #4): the
five per-round sweeps run on the sf0.001 fixtures, but the classes they
catch interact with SIZE — broadcast caps, int64 fixed-point grids, LSH
band-key cliques and skew-salting are all data-volume-dependent — so a
fixture-green guard can still be scale-red (round 10 proved it: the
element-NULL vector class was green at sf0.001 and red here). This script
rebuilds the 10× replica of sf0.1 (scripts/scale_probe.py's key-shifted
replication), applies the DEGENERATE, null-corpus, extreme-values and
RAGGED-vector mutations to it (all four adversarial families), and runs the
~30 scale-sensitive queries (the null sweep's REPEAT_3X window list plus
the extreme grid's guard-wave five) through the hash-exact Spark-vs-DuckDB
comparison at ~sf1.

Usage:
  python3 scripts/scale_sweep.py                  # replicate + mutate + run
  SCALE_SWEEP_REUSE_DIR=/tmp/scale_sweep_XXXX python3 scripts/scale_sweep.py
"""

from __future__ import annotations

import gc
import os
import sys
import tempfile

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from null_sweep import REPEAT_3X
from scale_probe import replicate

from crystal_parquet_database_spark.runtime import release_all_session_blocks
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.testing import compare_query

# the extreme grid's guard-wave five (SCALE.md round-9 closing A/B) — the
# queries whose one-bad-row crash class is explicitly size-coupled (decimal
# sums near 1e308, int32/int64 bucket grids, window fixed-point arithmetic)
EXTREME_FIVE = [
    "agg_value_histogram",
    "stream_running_user_stats",
    "stream_tumbling_window_counts",
    "events_multires_rollup",
    "sim_label_centroid_outliers",
]

# round-11 additions: both new text-dedup operators are scale-sensitive
# (gram-inventory shuffle sized by corpus; length-bucket candidate counts)
NEW_R11 = [
    "text_duplicate_spans",
    "dedup_edit_distance_pairs",
]

# round-12 additions, each size-coupled: k-means updates run on the int64
# fixed-point grid (overflow bound ∝ cell population); both evaluation ops
# rest on two-phase prefix sums whose partition offsets scale with data;
# the importance model's broadcast and hot-bucket counts grow with the
# corpus; the full-text verify mode's banded-DP cost tracks candidate count
NEW_R12 = [
    "sim_kmeans_train_assign",
    "eval_classifier_auc",
    "eval_classifier_calibration",
    "sample_importance_reweight",
    "dedup_edit_distance_full",
    "dedup_edit_distance_clusters",  # iterative CC rounds scale with diameter
    "text_duplication_fraction",     # rides the corpus-sized gram inventory
]

# round-13 additions: the trained-quantizer compositions are size-coupled
# through the k-means trainings (int64 fixed-point grid, cell-population
# overflow bound) AND the probe/candidate joins (cell occupancy grows with
# the corpus while the codebooks stay fixed)
NEW_R13 = [
    "sim_ivf_trained_recall_at_k",
    "sim_pq_trained_recall_at_k",
    "sim_ivfpq_trained_recall_at_k",
    # cross-corpus boilerplate removal rides a corpus-sized chunk-hash
    # inventory (size-coupled like the keep-first sibling).
    # sample_temperature_mixture is deliberately absent: a 5-group
    # aggregate has no size-coupled failure class; the six fixture sweeps
    # already run it on every adversarial corpus.
    "text_boilerplate_chunks",
    # true-NN reciprocal rank rides the full trained-IVFPQ chain (cell
    # occupancy and candidate counts grow with the corpus)
    "sim_ivfpq_trained_mrr",
    # eval_lsh_pair_recall is deliberately ABSENT: its truth arm is the
    # all-pairs exact-Jaccard baseline — quadratic in the corpus by
    # design (50k docs -> 2.5e9 pair evaluations here), the same class
    # the battery already excludes via dedup_ngram_jaccard. Its LSH arm's
    # scale behavior is covered by dedup_minhash_lsh's own battery seat.
]

# round-14 compositions, both size-coupled: trained SemDeDup's K grows with
# the corpus (K = max(8, 4n/500) — the cluster-count-∝-corpus design IS the
# scale contract) on top of the k-means fixed-point grid; the trained
# hybrid rides the full trained-IVFPQ chain plus BM25's corpus-sized df
# statistics
NEW_R14 = [
    "dedup_semantic_semdedup_trained",
    "text_hybrid_rrf_trained",
    # residual encoding stacks a second size-coupled training (residual
    # k-means per subspace) on the trained-IVFPQ chain
    "sim_ivfpq_residual_recall_at_k",
    # per-language NTILE bucketing over the corpus-sized bigram model —
    # partition populations (and therefore every bucket boundary) move
    # with the corpus
    "text_ccnet_perplexity_buckets",
    # neighbor sets (and therefore vote outcomes) shift with corpus size
    "sim_knn_label_vote",
    # text_gopher_quality_flags is deliberately absent: a pure per-row map
    # stage has no size-coupled failure class (the sample_temperature_mixture
    # rule); the six fixture sweeps run it on every adversarial corpus.
]

QUERIES_TO_RUN = sorted(
    set(REPEAT_3X) | set(EXTREME_FIVE) | set(NEW_R11) | set(NEW_R12)
    | set(NEW_R13) | set(NEW_R14)
)


def mutate(dst: str) -> None:
    """Apply the degenerate, null-corpus and extreme-values edits to the
    replica — id-keyed exactly like the fixture sweeps (the replica's first
    copy keeps the base ids, so doc_id 7/301/11/13 and vec_id 50/2/55/70/202
    all exist), with the synthetic no-content docs keyed PAST the replica's max
    id instead of at 10001/10002 (which are real doc_ids at this scale).
    Degenerate edits go FIRST so the null edits keep winning on their
    specific ids (doc 301 is both %8==5 and the null corpus's no-content
    doc — the NULL must survive)."""
    import numpy as np

    from degenerate_sweep import DEGENERATE_TEXTS

    def rd(name: str) -> pd.DataFrame:
        return pd.read_parquet(os.path.join(dst, f"{name}.parquet"))

    def wr(df: pd.DataFrame, name: str) -> None:
        # replace the replica's directory-shaped table with one flat file
        import shutil

        p = os.path.join(dst, f"{name}.parquet")
        if os.path.isdir(p):
            shutil.rmtree(p)
        df.to_parquet(p, index=False)

    docs = rd("documents")
    # degenerate bodies first — the %8==5 keying hits every replica copy,
    # so zero-signal docs are spread across the full id range at scale
    targets = [i for i in docs.index if docs.loc[i, "doc_id"] % 8 == 5]
    nd = len(DEGENERATE_TEXTS)
    for j, i in enumerate(targets):
        t = DEGENERATE_TEXTS[j % nd]
        docs.loc[i, "text"] = t
        docs.loc[i, "n_chars"] = len(t)
    docs.loc[docs["doc_id"] % 16 == 6, "lang"] = ""
    docs.loc[docs["doc_id"] % 16 == 10, "source"] = ""
    docs.loc[docs["doc_id"] == 7, "text"] = None
    docs.loc[docs["doc_id"] == 301, "text"] = None
    docs.loc[docs["doc_id"] == 11, "source"] = None
    docs.loc[docs["doc_id"] == 13, "lang"] = None
    nxt = int(docs["doc_id"].max()) + 1
    extra = pd.DataFrame(
        {"doc_id": [nxt, nxt + 1], "text": [None, None],
         "lang": ["en", "de"], "source": ["src0", "src1"], "n_chars": [0, 0]}
    ).astype(docs.dtypes.to_dict())
    docs = pd.concat([docs, extra], ignore_index=True)
    wr(docs, "documents")

    emb = rd("embeddings")
    # degenerate vectors (base copy only, disjoint from the null edits);
    # inf stored explicitly — a finite float32 cannot overflow the 64-term
    # double fold, so the honest probe is the already-overflowed value
    # (same ADVICE fix as degenerate_sweep.set_vec)
    for vid, val in ((10, 0.0), (20, 0.5), (30, float("inf")), (40, 5e-324)):
        idx = emb.index[emb["vec_id"] == vid]
        if len(idx):
            dim = len(emb.at[idx[0], "embedding"])
            emb.at[idx[0], "embedding"] = [np.float32(val)] * dim
    idx60 = emb.index[emb["vec_id"] == 60]
    if len(idx60):
        emb.at[idx60[0], "embedding"] = []  # zero-LENGTH (present, not NULL)
    emb.loc[emb["vec_id"] == 50, "embedding"] = None  # failed-encoder row
    i2 = emb.index[emb["vec_id"] == 2][0]
    emb.at[i2, "embedding"] = [
        None if j == 3 else v for j, v in enumerate(emb.at[i2, "embedding"])
    ]
    # RAGGED vectors (round 10's disclosed mixed-encoder class, the fourth
    # mutation family): a 32-dim and a 96-dim row among the 64-dim corpus,
    # plus one SEED row (vec_id 202: a semdedup cell + PQ codebook entry) —
    # partial distances are NULL in Spark's padded zip_with fold but
    # NUMBERS in DuckDB's NULL-skipping list folds, so only the
    # dim-extended contract keeps the engines aligned, and only AT SCALE do
    # the misassigned cells produce visible divergence (the r10 lesson)
    for vid, new_dim in ((55, 32), (70, 96), (202, 32)):
        idx = emb.index[emb["vec_id"] == vid]
        if len(idx):
            old = list(emb.at[idx[0], "embedding"])
            vals = (old * ((new_dim // len(old)) + 1))[:new_dim]
            emb.at[idx[0], "embedding"] = np.asarray(vals, dtype=np.float32)
    idx80 = emb.index[emb["vec_id"] == 80]
    if len(idx80):
        # NaN-ELEMENT vector: probed cross-engine CONSISTENT via parquet
        # (NaN propagates through both engines' folds; NaN >= τ true and
        # NaN-first DESC in both), so it stays VALID under the contract —
        # pinned here so the lockstep is gated at scale too
        v = list(emb.at[idx80[0], "embedding"])
        v[5] = np.float32("nan")
        emb.at[idx80[0], "embedding"] = np.asarray(v, dtype=np.float32)
    wr(emb, "embeddings")

    ev = rd("events")
    # degenerate: empty-string event_type forms its own funnel/path group
    ev.loc[ev["event_id"] % 16 == 13, "event_type"] = ""
    # extreme numeric edges, id-keyed mod patterns (scale-independent)
    ev.loc[ev["event_id"] % 50 == 1, "value"] = float("nan")
    ev.loc[ev["event_id"] % 50 == 2, "value"] = float("inf")
    ev.loc[ev["event_id"] % 50 == 3, "value"] = float("-inf")
    ev.loc[ev["event_id"] % 50 == 4, "value"] = -0.0
    ev.loc[ev["event_id"] % 50 == 5, "value"] = 1.7e308
    ev.loc[ev["event_id"] % 50 == 6, "value"] = 5e-324
    ev.loc[ev["event_id"] % 50 == 7, "value"] = -1.7e308
    ev.loc[ev["event_id"] % 50 == 8, "value"] = 3e9
    ev.loc[ev["event_id"] % 50 == 9, "value"] = -3e9
    # temporal edges + null-corpus clockless/failed-parse rows
    ts = ev["ts"]
    if not pd.api.types.is_datetime64_any_dtype(ts):
        raise SystemExit(f"unexpected events.ts dtype {ts.dtype}")
    ev.loc[ev["event_id"] % 97 == 11, "ts"] = pd.Timestamp("1970-01-01 00:00:00")
    ev.loc[ev["event_id"] % 97 == 23, "ts"] = pd.Timestamp("2200-06-15 23:59:59")
    ev.loc[ev.index[:3], "event_type"] = None
    ev.loc[ev.index[3:5], "ts"] = pd.NaT
    wr(ev, "events")


def main() -> None:
    reuse = os.environ.get("SCALE_SWEEP_REUSE_DIR")
    spark = get_spark(app_name="scale_sweep")
    if reuse:
        dst = reuse
        print(f"reusing mutated replica {dst}", flush=True)
    else:
        dst = tempfile.mkdtemp(prefix="scale_sweep_")
        print(f"replicating sf0.1 x10 into {dst} ...", flush=True)
        replicate(spark, 10, dst)
        print("mutating (degenerate + null + extreme + ragged edits) ...", flush=True)
        mutate(dst)
    fails = []
    for name in QUERIES_TO_RUN:
        try:
            ok, msg = compare_query(spark, name, dst)
        except Exception as e:  # surface, don't abort the sweep
            ok, msg = False, f"{name}: EXC {type(e).__name__}: {e}"
        finally:
            release_all_session_blocks(spark)
            gc.collect()
        print(("MATCH " if ok else "FAIL ") + msg.splitlines()[0][:200], flush=True)
        if not ok:
            fails.append(name)
    print(
        f"DONE {len(QUERIES_TO_RUN) - len(fails)}/{len(QUERIES_TO_RUN)} green "
        f"on 10x degenerate+null+extreme replica; dir={dst}"
    )
    if fails:
        print("FAILS:", fails)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
