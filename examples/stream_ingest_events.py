#!/usr/bin/env python3
"""Exactly-once streaming ingestion into PqDB — end to end.

Drives the replayable synthetic-events streaming source
(streaming/event_source.py) through the idempotent foreachBatch sink
(streaming/ingest.py) into a PqDB dataset, then PROVES the exactly-once
contract the way an operator would check it in production:

 1. drain two micro-batches into the dataset (availableNow trigger, resumed
    from the same checkpoint — each drain advances one offset window);
 2. drain again WITHOUT the checkpoint — a full replay from offset 0, the
    worst case of at-least-once delivery — and assert the row count did not
    move (the natural-key anti-join absorbed every replayed row);
 3. resume from the real checkpoint and assert exactly one new batch
    appended, with ids unique and contiguous (no replay burned an id range).

Run: python3 examples/stream_ingest_events.py [work_dir]

100 TB shape: per-batch cost is one key-column scan (partition-prunable)
plus a batch-sized broadcast anti-join — flat as the dataset grows; see
streaming/ingest.py's module docstring.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from crystal_parquet_database_spark import PqDB, get_spark
from crystal_parquet_database_spark.streaming.event_source import (
    SyntheticEventsDataSource,
)
from crystal_parquet_database_spark.streaming.ingest import stream_ingest_into_pqdb

BATCH = 100


def main(work_dir: str | None = None) -> PqDB:
    work = work_dir or tempfile.mkdtemp(prefix="ingest_demo_")
    spark = get_spark(app_name="stream-ingest-example")
    spark.dataSource.register(SyntheticEventsDataSource)
    db = PqDB(spark, os.path.join(work, "events_db"))
    ckpt = os.path.join(work, "ckpt")

    def drain(checkpoint: str) -> None:
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", BATCH)
            .load()
        )
        q = stream_ingest_into_pqdb(stream, db, "event_id", checkpoint)
        try:
            # awaitTermination returns False on TIMEOUT: stopping a
            # half-finished batch then failing the later row-count assert
            # would be indistinguishable from a real exactly-once violation
            if not q.awaitTermination(120):
                raise TimeoutError("drain did not finish within 120s")
        finally:
            q.stop()

    # 1) two drains from the same checkpoint: offsets [0,100) then [100,200)
    drain(ckpt)
    drain(ckpt)
    n1 = db.read(columns=["event_id"]).count()
    print(f"after two drains: {n1} rows")
    assert n1 == 2 * BATCH, n1

    # 2) lost-checkpoint disaster drill: a fresh checkpoint makes the source
    # replay from offset 0; idempotence by natural key must absorb all of it
    drain(os.path.join(work, "ckpt_replay"))
    n2 = db.read(columns=["event_id"]).count()
    print(f"after full replay: {n2} rows (unchanged)")
    assert n2 == n1, (n1, n2)

    # 3) resume from the REAL checkpoint: exactly one new window lands
    drain(ckpt)
    n3 = db.read(columns=["event_id"]).count()
    print(f"after resumed drain: {n3} rows")
    assert n3 == 3 * BATCH, n3

    ids = db.read(columns=["id", "event_id"])
    n_ids = ids.select("id").distinct().count()
    n_keys = ids.select("event_id").distinct().count()
    assert n_ids == n_keys == 3 * BATCH, (n_ids, n_keys)
    top = ids.agg(F.max("id")).collect()[0][0]
    assert top == 3 * BATCH - 1, top  # contiguous: no replay burned a range
    print(f"exactly-once verified: {n3} unique keys, contiguous ids 0..{top}")
    return db


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
