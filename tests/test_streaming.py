"""Batch ⇄ streaming equivalence: the same builder over a real readStream
(parquet source → memory sink) must produce the batch result."""

from __future__ import annotations

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from crystal_parquet_database_spark.streaming import windows as SW
from crystal_parquet_database_spark.tables import load_table
from crystal_parquet_database_spark.testing import canon_frame


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events (with ts already converted to timestamp) as a streamable dir."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, events_dir, builder, name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = builder(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").toPandas()
    finally:
        q.stop()


def test_tumbling_stream_equals_batch(spark, sf_dir, events_dir):
    batch = SW.tumbling_counts(load_table(spark, sf_dir, "events")).toPandas()
    stream = _run_stream(spark, events_dir, SW.tumbling_counts, "t_tumbling")
    assert canon_frame(stream) == canon_frame(batch)


def test_sliding_stream_equals_batch(spark, sf_dir, events_dir):
    batch = SW.sliding_counts(load_table(spark, sf_dir, "events")).toPandas()
    stream = _run_stream(spark, events_dir, SW.sliding_counts, "t_sliding")
    assert canon_frame(stream) == canon_frame(batch)


def test_session_stream_equals_batch(spark, sf_dir, events_dir):
    batch = SW.session_windows(load_table(spark, sf_dir, "events")).toPandas()
    stream = _run_stream(spark, events_dir, SW.session_windows, "t_session")
    assert canon_frame(stream) == canon_frame(batch)


def test_streaming_dedup_bounded_state(spark, sf_dir, events_dir):
    """dropDuplicates within watermark on the stream: every (user, type) key
    appears exactly once, and the key set equals the batch first-event keys."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = SW.first_event_per_key(stream).select("user_id", "event_type")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_dedup").toPandas()
    finally:
        q.stop()
    batch_keys = (
        SW.first_event_per_key(load_table(spark, sf_dir, "events"))
        .select("user_id", "event_type")
        .toPandas()
    )
    assert len(got) == len(got.drop_duplicates())
    assert canon_frame(got) == canon_frame(batch_keys)


def test_windowed_distinct_stream_equals_batch(spark, sf_dir, events_dir):
    """Chained stateful ops (dedup → windowed agg) on a real stream match the
    batch run of the same builder."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = SW.windowed_distinct_keys(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wdk")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_wdk").toPandas()
    finally:
        q.stop()
    batch = SW.windowed_distinct_keys(
        load_table(spark, sf_dir, "events")
    ).toPandas()
    # append mode emits only windows closed by the watermark; every emitted
    # window must match its batch row, and most windows must have closed.
    merged = got.merge(batch, on=["window_start", "window_end"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["n_distinct_keys_s"] == merged["n_distinct_keys_b"]).all()
    assert len(got) >= 0.5 * len(batch)


def test_stream_stream_join_equals_batch(spark, sf_dir, events_dir):
    """Stream-stream self-join (watermarked both sides, event-time-bounded):
    the append-mode pair stream must equal the batch time-range join."""
    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    batch = view_purchase_pairs(load_table(spark, sf_dir, "events")).toPandas()
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = view_purchase_pairs(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssjoin")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_ssjoin").toPandas()
    finally:
        q.stop()
    assert canon_frame(got) == canon_frame(batch)
    assert len(got) > 0


def test_stream_static_enrich_equals_batch(spark, sf_dir, events_dir):
    """Stream-static join (stateless, broadcast dim): append-mode stream
    output equals the batch join."""
    from crystal_parquet_database_spark.streaming.joins import enrich_with_customer

    dim = load_table(spark, sf_dir, "customer")
    batch = enrich_with_customer(load_table(spark, sf_dir, "events"), dim).toPandas()
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        enrich_with_customer(stream, dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_enrich")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_enrich").toPandas()
    finally:
        q.stop()
    assert canon_frame(got) == canon_frame(batch)
    assert len(got) > 0


def test_stream_stream_left_outer_join_flushes_unmatched(spark, sf_dir, events_dir):
    """Left-outer stream-stream join: unmatched views are emitted only once
    the watermark proves no match can arrive. A far-future sentinel view
    advances the watermark past every real view's horizon, so the flushed
    append stream must equal the batch left join over the real events (the
    sentinel itself stays pending in state — never emitted)."""
    import shutil

    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    ev = load_table(spark, sf_dir, "events")
    batch = view_purchase_pairs(ev, how="left_outer").toPandas()

    d = tempfile.mkdtemp(prefix="events_stream_louter_")
    shutil.copytree(events_dir, d, dirs_exist_ok=True)
    max_ts = ev.agg(F.max("ts")).first()[0]
    # One sentinel PER SIDE: each side filters its event_type BEFORE its
    # watermark node, so the global watermark (min of both) only advances if
    # both a future view AND a future purchase arrive. Distinct negative
    # user_ids keep the sentinels from pairing with anything.
    far = max_ts + datetime.timedelta(days=30)
    sentinel = spark.createDataFrame(
        [
            (-1, far, -1, "view", 0.0, "{}"),
            (-2, far, -2, "purchase", 0.0, "{}"),
        ],
        schema=ev.schema,
    )
    sentinel.write.mode("append").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = view_purchase_pairs(stream, how="left_outer")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssjoin_louter")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_ssjoin_louter WHERE view_id >= 0").toPandas()
    finally:
        q.stop()
    assert canon_frame(got) == canon_frame(batch)
    # the outer rows are the point: some views must appear with null purchase
    assert got["purchase_id"].isna().any()


def test_stream_stream_full_outer_join_flushes_both_sides(spark, sf_dir, events_dir):
    """Full-outer stream-stream join: BOTH unmatched views and unmatched
    purchases flush once the watermark passes their horizon. Same sentinel
    trick as the left-outer test; the flushed append stream must equal the
    batch full join over the real events."""
    import shutil

    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    ev = load_table(spark, sf_dir, "events")
    batch = view_purchase_pairs(ev, how="full_outer").toPandas()

    d = tempfile.mkdtemp(prefix="events_stream_fouter_")
    shutil.copytree(events_dir, d, dirs_exist_ok=True)
    max_ts = ev.agg(F.max("ts")).first()[0]
    far = max_ts + datetime.timedelta(days=30)
    sentinel = spark.createDataFrame(
        [
            (-1, far, -1, "view", 0.0, "{}"),
            (-2, far, -2, "purchase", 0.0, "{}"),
        ],
        schema=ev.schema,
    )
    sentinel.write.mode("append").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out = view_purchase_pairs(stream, how="full_outer")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssjoin_fouter")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM t_ssjoin_fouter "
            "WHERE COALESCE(view_id, 0) >= 0 AND COALESCE(purchase_id, 0) >= 0"
        ).toPandas()
    finally:
        q.stop()
    assert canon_frame(got) == canon_frame(batch)
    # both outer directions must actually occur
    assert got["purchase_id"].isna().any()
    assert got["view_id"].isna().any()


def test_synthetic_events_python_stream_source(spark):
    """Custom Python streaming source: micro-batches arrive with the events
    schema, rows are a pure function of the offset index (deterministic
    replay), and a windowed aggregation runs on top of it end to end."""
    from crystal_parquet_database_spark.streaming.event_source import (
        SyntheticEventsDataSource, _row,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .load()
    )
    agg = stream.groupBy("event_type").count()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_pysource")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
        got = {r["event_type"]: r["count"] for r in spark.sql("SELECT * FROM t_pysource").collect()}
    finally:
        q.stop()
    # availableNow drains exactly one batch: 50 deterministic rows
    want: dict[str, int] = {}
    for i in range(50):
        want[_row(i)[3]] = want.get(_row(i)[3], 0) + 1
    assert got == want


def test_synthetic_events_checkpoint_restart_exactly_once(spark, tmp_path):
    """Restart-replay proof for the custom streaming source: a checkpointed
    query stopped and restarted must resume from the committed offset with
    NO duplicated and NO missing rows (end-to-end exactly-once with a file
    sink), and a windowed aggregate over the sink must equal the batch
    recomputation over the same deterministic rows."""
    from crystal_parquet_database_spark.streaming.event_source import (
        SyntheticEventsDataSource, _row,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def drain_once() -> None:
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 50)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    drain_once()               # batch 0: rows [0, 50)
    n1 = spark.read.parquet(sink).count()
    drain_once()               # RESTART from checkpoint: rows [50, 100)
    out = spark.read.parquet(sink)
    ids = sorted(r["event_id"] for r in out.select("event_id").collect())
    assert n1 == 50
    assert ids == list(range(100))  # no dupes, no gaps across the restart

    # windowed aggregate over the replayed output == batch recomputation
    got = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in out.groupBy(
            F.window("ts", "5 minutes").alias("w"), "event_type"
        ).agg(F.count("*").alias("n")).collect()
    }
    want: dict[tuple, int] = {}
    for i in range(100):
        _, ts, _, etype, _, _props = _row(i)
        start = ts.replace(tzinfo=None) - datetime.timedelta(
            seconds=(ts.minute % 5) * 60 + ts.second
        )
        want[(start, etype)] = want.get((start, etype), 0) + 1
    assert got == want


def test_windowed_approx_distinct_stream_equals_batch(spark, sf_dir, events_dir):
    """The HLL sketch is a deterministic function of each window's key
    multiset, so streaming and batch runs emit IDENTICAL estimates."""
    batch = SW.windowed_approx_distinct(
        load_table(spark, sf_dir, "events")
    ).toPandas()
    stream = _run_stream(
        spark, events_dir, SW.windowed_approx_distinct, "t_approx_distinct"
    )
    assert canon_frame(stream) == canon_frame(batch)
    assert (batch["approx_keys"] > 0).all()


def test_stream_ingest_into_pqdb_exactly_once(spark, tmp_path):
    """End-to-end exactly-once ingestion: custom replayable source →
    foreachBatch idempotent upsert → PqDB. Three phases: drain one batch,
    restart from checkpoint (next offsets), then WIPE the checkpoint and
    re-drain from offset 0 — the replay must append nothing new."""
    from crystal_parquet_database_spark.db import PqDB
    from crystal_parquet_database_spark.streaming.event_source import (
        SyntheticEventsDataSource,
    )
    from crystal_parquet_database_spark.streaming.ingest import stream_ingest_into_pqdb

    spark.dataSource.register(SyntheticEventsDataSource)
    db = PqDB(spark, str(tmp_path / "events_db"))
    ckpt = str(tmp_path / "ckpt")

    def drain(checkpoint: str) -> None:
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 50)
            .load()
        )
        q = stream_ingest_into_pqdb(stream, db, "event_id", checkpoint)
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    drain(ckpt)                       # batch [0, 50)
    assert db.read(columns=["event_id"]).count() == 50
    drain(ckpt)                       # restart: batch [50, 100)
    ids = sorted(r["event_id"] for r in db.read(columns=["event_id"]).collect())
    assert ids == list(range(100))
    # simulate a lost checkpoint: the source replays from offset 0 — the
    # idempotent sink must drop every already-present key
    drain(str(tmp_path / "ckpt2"))    # replays [0, 50)
    ids2 = sorted(r["event_id"] for r in db.read(columns=["event_id"]).collect())
    assert ids2 == list(range(100))   # no dupes, nothing lost


def test_ingest_new_rows_batch_is_build_side(spark, tmp_path):
    """Scale-shape regression (round-7 review): Spark can only broadcast the
    RIGHT side of a left_anti join, so the one-hop ``batch ANTI existing``
    made the ever-growing history keyset the build side — re-broadcast (or
    sort-merge-shuffled) in full on EVERY micro-batch. The two-hop shape
    (semi-join history × broadcast(batch), anti-join batch ×
    broadcast(collided)) must plan as two BroadcastHashJoins with no
    SortMergeJoin, and still be exactly-once correct incl. the NULL key."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.plans.inspect import formatted_plan
    from crystal_parquet_database_spark.streaming.ingest import new_rows_vs_existing

    existing = spark.createDataFrame(
        [(1,), (2,), (None,)], "`__existing_key` long"
    )
    batch = spark.createDataFrame(
        [(2, "dup"), (3, "new"), (None, "null-dup")], "k long, v string"
    )
    out = new_rows_vs_existing(batch, existing, "k")
    assert [(r["k"], r["v"]) for r in out.collect()] == [(3, "new")]
    plan = formatted_plan(out)
    # both joins broadcast the batch-derived side: nothing sort-merge/
    # shuffle-joins, so the history relation is never exchanged
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # an all-new batch (no collisions) passes through untouched
    fresh = spark.createDataFrame([(7, "a"), (8, "b")], "k long, v string")
    assert new_rows_vs_existing(fresh, existing, "k").count() == 2


def test_ingest_backfill_batch_takes_shuffle_path(spark, monkeypatch):
    """The broadcast-guard's other arm (round-9 addition, plan-asserted per
    the round-9 verdict's ask): a batch past ``_BROADCAST_KEY_CAP`` must NOT
    carry a mandatory broadcast hint — one giant availableNow backfill batch
    would otherwise abort the whole query on the 8GB broadcast cap — and
    instead degrade to a shuffle join, while staying exactly-once correct.

    The cap is monkeypatched tiny; the real ~1M-key threshold is sized in
    streaming/ingest.py (≈100MB of keys vs the 8GB cap)."""
    from pyspark.sql import functions as F  # noqa: F401

    from crystal_parquet_database_spark.plans.inspect import formatted_plan
    from crystal_parquet_database_spark.streaming import ingest

    monkeypatch.setattr(ingest, "_BROADCAST_KEY_CAP", 3)
    # The guard's contract is about the mandatory HINT, not Catalyst's own
    # size-based choice (these test frames are tiny, so the static planner
    # would legitimately auto-broadcast them hint-free — at real backfill
    # scale it would not). Disabling auto-broadcast makes the plan readable:
    # any BroadcastExchange left can ONLY come from the guard's hint.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        existing = spark.range(0, 50).select(F.col("id").alias("__existing_key"))
        # 10 rows > cap=3 → the row probe must flip the joins off the hint
        batch = spark.range(45, 55).select(
            F.col("id").alias("k"), F.lit("v").alias("v")
        )
        out = ingest.new_rows_vs_existing(batch, existing, "k")
        plan = formatted_plan(out)
        assert "BroadcastExchange" not in plan  # no hinted build side anywhere
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert sorted(r["k"] for r in out.collect()) == [50, 51, 52, 53, 54]
        # and a steady batch (≤ cap) still broadcasts — via the hint alone
        small = spark.range(48, 52).select(
            F.col("id").alias("k"), F.lit("v").alias("v")
        )
        monkeypatch.setattr(ingest, "_BROADCAST_KEY_CAP", 1000)
        plan_small = formatted_plan(
            ingest.new_rows_vs_existing(small, existing, "k")
        )
        assert "BroadcastHashJoin" in plan_small
        assert "SortMergeJoin" not in plan_small
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_stream_ingest_releases_checkpoint_blocks(spark, tmp_path):
    """Long-running-ingest memory regression: each micro-batch eagerly
    localCheckpoints its deduped frame; the sink must unpersist those RDD
    blocks per batch (DataFrame.unpersist and del+gc both fail to —
    only a targeted RDD unpersist is deterministic), or continuous-mode
    block-manager memory grows without bound."""
    from crystal_parquet_database_spark.db import PqDB
    from crystal_parquet_database_spark.streaming.event_source import (
        SyntheticEventsDataSource,
    )
    from crystal_parquet_database_spark.streaming.ingest import stream_ingest_into_pqdb

    sc = spark.sparkContext
    baseline = len(sc._jsc.sc().getRDDStorageInfo())
    spark.dataSource.register(SyntheticEventsDataSource)
    db = PqDB(spark, str(tmp_path / "events_db"))
    for i in range(3):  # three drains = three checkpointed micro-batches
        stream = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", 40)
            .load()
        )
        q = stream_ingest_into_pqdb(stream, db, "event_id", str(tmp_path / "ckpt"))
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
    assert db.read(columns=["event_id"]).count() == 120
    assert len(sc._jsc.sc().getRDDStorageInfo()) <= baseline  # nothing lingers


def test_windowed_approx_distinct_all_null_key_window(spark, tmp_path):
    """Regression: a 5-minute window whose events all carry NULL user_id has
    exact_keys=0 — the 5%% check used to divide by it (ANSI: hard
    DIVIDE_BY_ZERO abort). The zero-key window must instead report
    within_5pct=TRUE iff the sketch also says zero."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crystal_parquet_database_spark.surface import QUERIES

    d = tmp_path / "sfx"
    d.mkdir()
    base = 1_700_000_000_000_000_000  # ns epoch
    rows = [
        # window 1: two NULL-key events only
        (1, base, None, "click", 1.0, "{}"),
        (2, base + 60_000_000_000, None, "view", 1.0, "{}"),
        # window 2 (ts + 10 min): real keys
        (3, base + 600_000_000_000, 7, "click", 1.0, "{}"),
        (4, base + 660_000_000_000, 8, "view", 1.0, "{}"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows]),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    out = {
        r["exact_keys"]: r["within_5pct"]
        for r in QUERIES["stream_windowed_approx_distinct"](spark, str(d)).collect()
    }
    assert out == {0: True, 2: True}


def test_tumbling_counts_nan_inf_as_missing(spark):
    """Round-8 review: ANSI cast(NaN/inf AS DECIMAL) aborted the whole
    query on the first non-finite value; the NaN-as-missing contract the
    stateful path documents now covers the windowed path too."""
    import math

    from pyspark.sql import functions as F

    rows = [
        ("2024-01-01 00:00:10", "view", 1.5),
        ("2024-01-01 00:00:20", "view", float("nan")),
        ("2024-01-01 00:00:30", "view", float("inf")),
        ("2024-01-01 00:00:40", "view", float("-inf")),
        ("2024-01-01 00:00:50", "view", 2.5),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    out = SW.tumbling_counts(df).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 5  # non-finite rows still COUNT
    assert math.isclose(out[0]["sum_value"], 4.0)  # but are missing in the sum


def test_enrich_keeps_payload_with_event_cols_none(spark, sf_dir):
    from crystal_parquet_database_spark.streaming.joins import enrich_with_customer

    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer")
    out = enrich_with_customer(ev, dim, event_cols=None)
    for c in ("value", "props"):
        assert c in out.columns  # payload survives enrichment
    # default projection unchanged (the registered query pins this schema)
    assert "value" not in enrich_with_customer(ev, dim).columns


def test_ingest_history_filter_bounds_scan_and_contract(spark, tmp_path):
    """Round-8 review: the module promised partition pruning with no
    mechanism — history_filter IS the mechanism, and its correctness
    contract (keys outside the filter are invisible to the dedup) must
    hold exactly as documented."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.db import PqDB
    from crystal_parquet_database_spark.streaming.ingest import new_rows_vs_existing

    db = PqDB(spark, str(tmp_path / "hist"), partition_by=["day"])
    db.create([{"event_id": i, "day": "d1" if i < 50 else "d2"} for i in range(100)])

    batch = spark.createDataFrame(
        [{"event_id": 10, "day": "d1"}, {"event_id": 999, "day": "d2"}]
    )
    # covering filter (both days): full dedup — only the new key appends
    existing_all = db.read(columns=["event_id"]).withColumnRenamed(
        "event_id", "__existing_key"
    )
    new_all = new_rows_vs_existing(batch, existing_all, "event_id")
    assert [r["event_id"] for r in new_all.collect()] == [999]

    # narrow filter (d2 only): key 10 in the EXCLUDED partition is
    # invisible — the documented re-append hazard, demonstrated
    existing_d2 = db.read(
        columns=["event_id"], filters=[("day", "==", "d2")]
    ).withColumnRenamed("event_id", "__existing_key")
    new_d2 = new_rows_vs_existing(batch, existing_d2, "event_id")
    assert sorted(r["event_id"] for r in new_d2.collect()) == [10, 999]
