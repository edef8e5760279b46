#!/usr/bin/env python3
"""Scale-up probe: replicate the sf0.1 fixtures ~Nx into /tmp (key-shifted so
cardinalities scale too), run headline operators, and report wall-clock vs the
sf0.1 baseline. Linear-ish growth = the plan survives scale-up; superlinear
growth = a hidden quadratic/skew problem.

Usage: python3 scripts/scale_probe.py [factor] [probe ...]   (default 10)
Set SCALE_PROBE_REUSE_DIR=/tmp/scaleNx_... to skip replication and reuse an
existing replica (replication dominates wall-clock for small probe subsets).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.surface import QUERIES

SRC = "/root/testdata/sf0.1"

PROBES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_topk_orders_per_customer",
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "dedup_simhash_fingerprint",
    "sim_cosine_topk_bruteforce",
    "text_quality_scores",
    "stream_session_windows",
    "dedup_cluster_components",
    "text_decontaminate_overlap",
    "text_tfidf_top_terms",
    "text_pack_sequences",
    "text_chunk_dedup_ratio",
    "text_ngram_topk",
    "sim_decontaminate_embeddings",
    "sample_global_shuffle",
    "sample_upsample_by_weight",
    "text_dedup_chunks_keep_first",
    # round 3
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_multires_rollup",
    "stream_view_purchase_join",
    "sample_token_budget_mixture",
    "text_pack_sequences_sorted",
    "sim_label_centroid_outliers",
    "stream_enrich_static_join",
    "dedup_incremental_new_vs_index",
    "text_token_rarity_score",
    "text_chunk_windows",
    # round 4
    "sim_ivf_recall_at_k",
    "agg_hll_error_bound",
    "events_funnel_sessionized",
    "llm_corpus_pipeline",
    # round 4, second wave
    "dedup_semantic_semdedup",
    "text_quality_classifier",
    "stream_view_purchase_full_join",
    "agg_kll_quantile_bound",
    "events_path_regex_match",
    "events_anomaly_hourly_zscore",
    "dedup_containment_pairs",
    # round 5
    "text_bm25_topk",
    "dedup_minhash_incremental",
    "text_bigram_fluency",
    "agg_cms_heavy_hitters",
    "stream_windowed_approx_distinct",
    "dedup_cluster_representatives",
    "sim_pq_recall_at_k",
    "text_hybrid_rrf_search",
    "events_session_transitions",
    "dedup_prefix_filter_pairs",
    # round 6
    "scd2_asof_dimension",
    "pqdb_update_delete_read",
    "cif_parse_real",
    "nested_struct_ops_real",
    "multimodal_video_header_real",
    # round 9: the two on-disk layout gates (r8 verdict ask #6) — the paths
    # whose cost is the part that grows at 100 TB (compaction shuffle,
    # z-order sort) had no 10x/30x point
    "layout_zorder_bucketed_join",
    "pqdb_normalize_compaction",
    "pqdb_normalize_compaction_full",  # probe-only, defined below
]


def _probe_normalize_compaction_full(spark, sf_dir: str):
    """Probe-only variant of pqdb_normalize_compaction WITHOUT the gated
    query's `doc_id < 600` slice: on a key-shifted replica that slice keeps
    only base-copy rows, so the gated form measures CONSTANT work at any
    factor. This variant ingests the FULL documents table (3 fragmented
    appends, partition_by=lang), compacts, and reads back — the compaction
    shuffle actually scales with the corpus."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.db import PqDB
    from crystal_parquet_database_spark.surface.scratch import fresh_dir
    from crystal_parquet_database_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    db = PqDB(
        spark, os.path.join(fresh_dir("probe_normalize_full"), "db"), partition_by=["lang"]
    )
    for k in range(3):
        db.create(docs.filter(F.col("doc_id") % 3 == k))
    db.normalize(max_rows_per_file=1_000_000)
    return db.read(columns=["doc_id", "lang", "n_chars"], filters=[("n_chars", ">", 100)]).groupBy(
        "lang"
    ).agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))


EXTRA_PROBES = {"pqdb_normalize_compaction_full": _probe_normalize_compaction_full}


def replicate(spark, factor: int, out_dir: str) -> None:
    """Union `factor` key-shifted copies of each table (ids/keys offset per
    copy so joins and groupings keep realistic cardinality growth)."""
    shifts = {
        "lineitem": {"l_orderkey": 1_000_000, "l_linenumber": 0},
        "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
        "customer": {"c_custkey": 100_000},
        # user_id shift must EXCEED the fixture's user span (0-1499 at
        # sf0.1): a 1,000 shift overlapped adjacent copies by 500 users,
        # interleaving two copies' event streams for a third of all users —
        # sessionization/retention probes then measured distorted per-user
        # structure, not clean cardinality growth.
        "events": {"event_id": 10_000_000, "user_id": 10_000},
        "documents": {"doc_id": 1_000_000},
        "embeddings": {"vec_id": 1_000_000},
        # dimension tables stay as-is (they'd be broadcast at any size)
        "supplier": {},
        "part": {},
        "nation": {},
        "region": {},
    }
    from crystal_parquet_database_spark.tables import load_table

    for name, shift in shifts.items():
        base = load_table(spark, SRC, name)  # handles the NANOS events column
        if not shift:
            base.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
            continue
        copies = []
        for i in range(factor):
            c = base
            for col, step in shift.items():
                if step:
                    c = c.withColumn(col, F.col(col) + F.lit(i * step))
            if name == "documents" and i > 0:
                # Perturb text per copy so copies of the same doc are NOT
                # duplicates of each other — otherwise the dedup probes
                # would measure C(factor,2) duplicate-group blowup that
                # replication itself manufactures, not the algorithm's
                # scaling. THREE independent character rings (each rotated
                # by 1-4, never 0 — the old single-ring form was the
                # IDENTITY for i % 5 == 0, so every 5th copy duplicated the
                # base text verbatim) give 4^3 = 64 distinct bijective
                # substitutions: no two copies below factor 64 share text,
                # and rotating whole frequency classes changes enough
                # shingles that cross-copy pairs don't band-collide either.
                rings = ("aeiou", "bcdfg", "hjklm")
                shifts_ = (1 + i % 4, 1 + (i // 4) % 4, 1 + (i // 16) % 4)
                src = "".join(rings)
                dst = "".join(
                    (r * 2)[s : s + len(r)] for r, s in zip(rings, shifts_)
                )
                c = c.withColumn("text", F.translate(F.col("text"), src, dst))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def run(sf_dir: str, label: str) -> dict[str, float]:
    import gc

    from crystal_parquet_database_spark.runtime import release_all_session_blocks

    spark = get_spark(app_name=f"scale_probe_{label}")
    times = {}
    for name in PROBES:
        fn = QUERIES.get(name) or EXTRA_PROBES[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = time.perf_counter() - t0
        # free the query's eager-localCheckpoint blocks before the next
        # measurement. gc.collect() alone is NOT enough — runtime.py
        # documents that the JVM side keeps dereferenced checkpointed RDDs
        # alive until ITS collector runs, which is exactly the crowding
        # that inflated late-sequence bench numbers 2-4x; release the
        # blocks deterministically the way bench.py and driver_sim do.
        release_all_session_blocks(spark)
        gc.collect()
    return times


def main() -> None:
    # child-generation dispatch rides ARGV, not an inherited env var: a
    # SCALE_PROBE_GEN_ONLY leaking from a caller's environment (e.g.
    # exported by a crashed run) used to make a normal probe invocation
    # silently replicate-and-exit without measuring anything (ADVICE r10)
    if len(sys.argv) >= 2 and sys.argv[1] == "--gen-only":
        if len(sys.argv) != 4:
            raise SystemExit("usage: scale_probe.py --gen-only DIR FACTOR")
        spark = get_spark(app_name="scale_probe_gen")
        replicate(spark, int(sys.argv[3]), sys.argv[2])
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:  # optional probe subset: scale_probe.py 10 q1 q2 ...
        global PROBES
        unknown = [n for n in sys.argv[2:] if n not in QUERIES and n not in EXTRA_PROBES]
        if unknown:
            raise SystemExit(f"unknown probe names: {unknown}")
        PROBES = list(sys.argv[2:])
    reuse = os.environ.get("SCALE_PROBE_REUSE_DIR")
    if reuse:
        out_dir = reuse
        print(f"reusing existing replica {out_dir}", flush=True)
    else:
        # GENERATE IN A CHILD PROCESS: probing in the JVM that just wrote a
        # multi-hundred-MB replica inflates the numbers (round-10 caught a
        # 30x trio run reading 2.2-2.6x its reuse-dir repeat — heap/GC/
        # block-manager crowding from the generation pass, not the
        # operators). The child replicates and exits; this process then
        # measures with the same clean-JVM state every REUSE_DIR run gets.
        import subprocess

        out_dir = tempfile.mkdtemp(prefix=f"scale{factor}x_")
        print(f"replicating sf0.1 x{factor} into {out_dir} (child process) ...", flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--gen-only",
             out_dir, str(factor)],
            check=True,
        )

    base = run(SRC, "base")
    big = run(out_dir, f"{factor}x")
    print(f"\n{'query':36s} {'sf0.1':>8s} {f'{factor}x':>8s} {'ratio':>7s}")
    for name in PROBES:
        r = big[name] / max(base[name], 1e-9)
        flag = "  <-- superlinear!" if r > factor * 2 else ""
        print(f"{name:36s} {base[name]:8.2f} {big[name]:8.2f} {r:6.1f}x{flag}", flush=True)


if __name__ == "__main__":
    main()
