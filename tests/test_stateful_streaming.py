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
