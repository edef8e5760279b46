"""applyInPandasWithState: state must accumulate across micro-batches and the
final state must equal the batch replay."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from crystal_parquet_database_spark.streaming.stateful import running_user_stats
from crystal_parquet_database_spark.tables import load_table


def test_running_stats_across_microbatches(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="stateful_")
    # several files → with maxFilesPerTrigger=1 each becomes its own microbatch
    events.repartition(4).write.mode("overwrite").parquet(d)

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.outputMode("update").format("memory").queryName("t_state").start()
    )
    try:
        q.processAllAvailable()
        updates = spark.sql("SELECT * FROM t_state").toPandas()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()

    assert n_batches >= 4  # state really evolved across multiple batches
    # multiple update rows per user (one per batch it appeared in)
    assert len(updates) > updates["user_id"].nunique()
    # last update per user == batch replay
    final = updates.groupby("user_id").last()
    batch = running_user_stats(load_table(spark, sf_dir, "events")).toPandas().set_index("user_id")
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n_events"]
        assert abs(final.loc[uid, "total_value"] - row["total_value"]) < 1e-6
        assert final.loc[uid, "max_value"] == row["max_value"]


def test_running_stats_all_null_values_match_batch(spark):
    """A key whose `value` cells are ALL null must emit NULL sum/max on the
    stream path, exactly like the batch replay (F.sum/F.max over nulls) — not
    the 0.0/-inf accumulator sentinels (regression: pandas max() over nulls is
    NaN and max(-inf, NaN) keeps -inf)."""
    import datetime as dt

    import pandas as pd

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), 7, "click", None) for i in range(3)
    ] + [(10 + i, dt.datetime(2024, 1, 1, 1, 0, i), 8, "view", float(i)) for i in range(2)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    events = spark.createDataFrame(rows, schema)

    d = tempfile.mkdtemp(prefix="stateful_null_")
    events.repartition(2).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state_null")
        .start()
    )
    try:
        q.processAllAvailable()
        updates = spark.sql("SELECT * FROM t_state_null").toPandas()
    finally:
        q.stop()
    final = updates.groupby("user_id").last()
    batch = running_user_stats(events).toPandas().set_index("user_id")

    assert final.loc[7, "n_events"] == batch.loc[7, "n_events"] == 3
    for col in ("total_value", "max_value"):  # all-null key → NULL both paths
        assert pd.isna(final.loc[7, col]) and pd.isna(batch.loc[7, col])
    assert final.loc[8, "max_value"] == batch.loc[8, "max_value"] == 1.0
    assert final.loc[8, "total_value"] == batch.loc[8, "total_value"] == 1.0
