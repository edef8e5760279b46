"""Continuous ingestion into PqDB: a foreachBatch sink whose idempotence
gives end-to-end exactly-once on top of any replayable source.

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``
(a micro-batch can re-run after a crash/restart), so the sink must tolerate
replays. This recipe makes the write idempotent by NATURAL KEY: each batch
is deduped on the key, anti-joined against the keys already in the dataset,
and only genuinely-new rows are appended — a replayed batch finds its rows
already present and appends nothing. No sink-side transaction log needed.

100 TB shape: the anti-join probes the existing dataset with the BATCH as
the small side (key column only — parquet scan prunes to one column), so
per-batch cost is one column scan + a batch-sized join, and appends never
rewrite history. This is the same history-never-rescanned contract as
``dedup_incremental_new_vs_index``; with a ``partition_by`` on the target
(e.g. event date) the key scan prunes to recent partitions and per-batch
cost stays flat as the dataset grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crystal_parquet_database_spark.db import PqDB
from crystal_parquet_database_spark.runtime import release_local_checkpoint


def stream_ingest_into_pqdb(
    stream_df: DataFrame,
    db: PqDB,
    key_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming query that appends each micro-batch's NEW keys to
    ``db`` (idempotent under replay — see module docstring). Returns the
    StreamingQuery; callers stop/await it.

    ``available_now=True`` drains everything currently available and stops
    (the backfill/test mode); ``False`` runs continuously.
    """

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([key_col])
        if db.exists:
            # NULL-SAFE anti-join: plain key equality never matches NULL, so
            # a replayed batch's NULL-key row would be re-appended on every
            # replay — breaking exactly-once for exactly one key. eqNullSafe
            # still plans as a hash equi-join; left_anti keeps batch columns.
            existing = db.read(columns=[key_col]).withColumnRenamed(
                key_col, "__existing_key"
            )
            batch = batch.join(
                existing,
                F.col(key_col).eqNullSafe(F.col("__existing_key")),
                "left_anti",
            )
        # materialize the dedupe+anti-join ONCE: the emptiness probe and
        # create()'s write would otherwise each re-run the whole pipeline
        # (including the growing key-column scan)
        batch = batch.localCheckpoint(eager=True)
        try:
            if batch.take(1):  # skip empty appends (fully-replayed batch)
                db.create(batch)
        finally:
            # Release THIS batch's checkpoint blocks before the next
            # micro-batch — in continuous mode (available_now=False) they
            # otherwise linger until JVM GC + ContextCleaner reap the dead
            # reference, growing block-manager memory across batches. The
            # helper unpersists exactly the RDD behind `batch`'s LogicalRDD
            # plan (safe under concurrent queries, unlike a registry diff;
            # rationale + verified non-alternatives in runtime.py).
            release_local_checkpoint(batch)

    writer = stream_df.writeStream.foreachBatch(upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
