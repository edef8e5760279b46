"""Runtime hygiene helpers shared by long-running paths (streaming ingest,
repeated SCD2 merges): deterministic release of eager-localCheckpoint RDD
blocks.

Why this exists (verified via getRDDStorageInfo): neither
``DataFrame.unpersist()`` (which only uncaches CacheManager query entries,
never checkpoint RDDs) nor ``del df; gc.collect()`` (the JVM side still
holds the reference until ITS collector runs and the async ContextCleaner
drains its queue) frees a localCheckpoint's blocks deterministically. The
blocks linger in the block manager between JVM GC cycles — the crowding
pathology that once inflated late-sequence bench numbers 2-4×. A
localCheckpointed Dataset's analyzed plan is a ``LogicalRDD`` wrapping the
persisted RDD, so the RDD can be unpersisted directly and exactly — no
global registry diffs that could race with concurrent queries' own
checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free the RDD blocks behind ``df = something.localCheckpoint(eager=True)``.

    Call ONLY after every action that reads ``df`` has completed — a
    localCheckpointed RDD has truncated lineage and cannot be recomputed.
    Returns True if a checkpoint RDD was found and unpersisted; silently
    returns False for non-checkpoint frames (best-effort by design, so call
    sites never fail on internal-API drift across Spark versions).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith("LogicalRDD"):
            plan.rdd().unpersist(False)
            return True
    except Exception:
        pass
    return False


def release_all_session_blocks(spark) -> int:
    """Between-queries hygiene for HARNESSES (bench.py, driver_sim): release
    every persistent RDD in the session — including the eager-localCheckpoint
    blocks the query surface and operators create per invocation, which no
    call site can release itself (the returned frame's execution still needs
    them; only the harness knows when the collect has happened) — and clear
    the DataFrame cache.

    Call ONLY at a point where no previously returned frame will be read
    again: a released localCheckpoint has truncated lineage and cannot be
    recomputed (a released persist()/cache() merely recomputes). Returns the
    number of RDDs unpersisted; best-effort, never raises — block release is
    hygiene, not correctness.
    """
    n = 0
    try:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
            n += 1
    except Exception:
        pass
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    return n
