"""Deterministic synthetic-events STREAMING source (Python DataSource API).

A custom Structured Streaming source — the axis the file-based recipes don't
cover: `spark.readStream.format("synthetic_events")` yields micro-batches of
the same event-log shape as the `events` fixture table, generated
deterministically from the offset range so every replay of an offset window
produces identical rows (the exactly-once contract a replayable source must
honor; Kafka gives it via log offsets, this source via pure functions of the
row index).

Offsets are plain row counts: batch N covers [start, start + rows_per_batch).
`SimpleDataSourceStreamReader` is the right base here — the engine tracks
offsets in its own checkpoint log, and replayed ranges recompute identical
rows, so no source-side commit bookkeeping is needed.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (spark.readStream.format("synthetic_events")
              .option("rows_per_batch", 100).load())

Fields mirror tables.load_table(..., "events"): (event_id long, ts timestamp,
user_id long, event_type string, value double, props string) — the full
fixture schema, so any batch recipe's column list also resolves against the
stream.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPES = ["click", "view", "purchase", "signup", "error"]
_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _row(i: int) -> tuple:
    # pure function of the index — replaying an offset range is exact.
    # event_type comes from a SECOND LCG draw: with one draw, user_id = h%150
    # and type = h%5 are locked together (5 divides 150), so every user would
    # emit exactly one event type forever and no cross-type behavior (funnels,
    # view→purchase joins) could ever fire on this source.
    h = (1103515245 * i + 12345) % (1 << 31)
    h2 = (1103515245 * h + 12345) % (1 << 31)
    return (
        i,
        _EPOCH + dt.timedelta(seconds=i * 7),
        h % 150,
        _TYPES[h2 % len(_TYPES)],
        float(h % 10_000) / 100.0,
        # fixture parity: events.parquet carries a JSON-ish props string; a
        # deterministic one keeps offset replay exact
        '{"session": %d}' % (h2 % 97),
    )


class _EventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._rows_per_batch = int(options.get("rows_per_batch", 100))
        if self._rows_per_batch <= 0:
            # fail FAST: 0 would spin the query forever planning empty
            # batches that never advance the offset; a negative value
            # would move the checkpointed offset BACKWARD each batch
            raise ValueError(
                f"rows_per_batch must be positive, got {self._rows_per_batch}"
            )

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["offset"]
        hi = lo + self._rows_per_batch
        return iter([_row(i) for i in range(lo, hi)]), {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay path after restart — identical rows by construction
        return iter([_row(i) for i in range(start["offset"], end["offset"])])


class SyntheticEventsDataSource(DataSource):
    """`synthetic_events` — deterministic replayable event stream (see
    module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _EventsStreamReader(self.options)
