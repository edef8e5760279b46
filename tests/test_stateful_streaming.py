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


def test_running_stats_nan_treated_as_missing_both_paths(spark):
    """NaN contract: Arrow hands the stateful UDF NULL and NaN as the same
    float NaN, so NaN must mean MISSING in both paths — the batch replay maps
    NaN->NULL before aggregating to keep the declared stream/batch
    equivalence on NaN-bearing input."""
    import math
    import tempfile

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [(1, 5.0), (1, float("nan")), (2, float("nan"))]
    batch = running_user_stats(spark.createDataFrame(rows, schema))
    got = {r["user_id"]: r for r in batch.collect()}
    assert got[1]["n_events"] == 2 and got[1]["total_value"] == 5.0
    assert got[1]["max_value"] == 5.0  # NOT NaN-as-greatest
    assert got[2]["total_value"] is None and got[2]["max_value"] is None

    d = tempfile.mkdtemp(prefix="stateful_nan_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state_nan")
        .start()
    )
    try:
        q.processAllAvailable()
        upd = {r["user_id"]: r for r in spark.sql("SELECT * FROM t_state_nan").collect()}
    finally:
        q.stop()
    assert upd[1]["total_value"] == 5.0 and upd[1]["max_value"] == 5.0
    assert upd[2]["total_value"] is None or math.isnan(upd[2]["total_value"]) is False
