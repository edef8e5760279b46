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
