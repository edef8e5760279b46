"""Fast locks for the round-9 extreme-values wave: the decimal-route
missing-value DOMAIN (NaN/±inf/huge-finite → NULL, mirrored in SQL), the
histogram's NULL "unbucketable" bin, and the centroid audit's
invalid-vector exclusion. The exhaustive form is scripts/extreme_sweep.py."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from crystal_parquet_database_spark.functions.exact import (
    MISSING_OUTSIDE_DOMAIN_SQL,
    missing_outside_domain,
)


def test_missing_outside_domain_engine_parity(spark):
    """The Spark guard and its SQL mirror agree on every edge value —
    including 1e12 itself (excluded: 13 integer digits) and the largest
    double just below it (kept: rounds at scale 6 without crossing)."""
    vals = [
        None, 1.5, -2.25, 0.0, -0.0,
        float("nan"), float("inf"), float("-inf"),
        1.7e308, -1.7e308, 5e-324, 1e12, -1e12, 999999999999.999878,
    ]
    df = spark.createDataFrame([(v,) for v in vals], schema="v double")
    got = [r[0] for r in df.select(missing_outside_domain("v")).collect()]
    want = [
        duckdb.connect()
        .execute(
            f"SELECT {MISSING_OUTSIDE_DOMAIN_SQL('v')} FROM (SELECT CAST(? AS DOUBLE) AS v)",
            [v],
        )
        .fetchone()[0]
        for v in vals
    ]
    assert got == want
    # the survivors are exactly the in-domain finite values
    assert [v for v in got if v is not None] == [
        1.5, -2.25, 0.0, -0.0, 5e-324, 999999999999.999878
    ]


def test_histogram_unbucketable_bin(spark, tmp_path):
    """NaN/±inf/|v| beyond the int32 bucket range land in ONE NULL bin
    instead of ANSI-aborting; -0.0 buckets as 0 with bucket_low +0.0."""
    from crystal_parquet_database_spark.surface.events_analytics import (
        agg_value_histogram,
    )

    pd.DataFrame(
        {
            "event_id": range(8),
            "ts": pd.to_datetime(["2024-01-01"] * 8),
            "user_id": [1] * 8,
            "event_type": ["view"] * 8,
            "value": [75.0, -0.0, float("nan"), float("inf"),
                      float("-inf"), 1.7e308, None, 3e9],
            "props": ["{}"] * 8,
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = {r["bucket"]: r for r in agg_value_histogram(spark, str(tmp_path)).collect()}
    assert out[None]["n"] == 5  # nan, +inf, -inf, 1.7e308, NULL
    assert out[None]["bucket_low"] is None
    assert out[0]["n"] == 1 and out[0]["bucket_low"] == 0.0
    assert out[1]["n"] == 1 and out[1]["bucket_low"] == 50.0
    # bucketable but bucket*width > INT32: the round-9 review's live crash
    # (int32 multiply ANSI-aborted both engines); must bucket, not abort
    assert out[60_000_000]["n"] == 1 and out[60_000_000]["bucket_low"] == 3e9


def test_centroid_outliers_excludes_invalid_vectors(spark):
    """A vector carrying a NULL/NaN/out-of-domain component is excluded from
    the audit entirely (one 1e18 component used to overflow the int64
    fixed-point grid and abort the job); valid vectors still rank."""
    from crystal_parquet_database_spark.operators.similarity import (
        label_centroid_outliers,
    )

    rows = [
        (1, [0.0, 0.0], 0),
        (2, [1.0, 1.0], 0),
        (3, [10.0, 10.0], 0),          # the genuine outlier
        (4, [1e18, 0.0], 0),           # out-of-domain component
        (5, [float("nan"), 0.0], 0),   # NaN component
        (6, None, 0),                  # no embedding at all
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<double>, label int")
    out = label_centroid_outliers(df, "vec_id", "embedding", "label", top_k=2)
    got = {r["vec_id"]: r["rank"] for r in out.collect()}
    assert set(got) == {3, 1}  # farthest two of the three VALID vectors
    assert got[3] == 1


def test_running_stats_huge_finite_treated_as_missing_both_paths(spark):
    """|v| >= 1e12 joins NaN/±inf in the missing class on BOTH the batch
    replay and the streaming state path — one 1.7e308 row used to
    ANSI-abort the batch replay's decimal-routed sum."""
    import tempfile

    from pyspark.sql import types as T

    from crystal_parquet_database_spark.streaming.stateful import running_user_stats

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [(1, 5.0), (1, 1.7e308), (2, -1.7e308), (2, None)]
    batch = running_user_stats(spark.createDataFrame(rows, schema))
    got = {r["user_id"]: r for r in batch.collect()}
    assert got[1]["n_events"] == 2 and got[1]["total_value"] == 5.0
    assert got[1]["max_value"] == 5.0
    assert got[2]["total_value"] is None and got[2]["max_value"] is None

    d = tempfile.mkdtemp(prefix="stateful_huge_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state_huge")
        .start()
    )
    try:
        q.processAllAvailable()
        upd = {r["user_id"]: r for r in spark.sql("SELECT * FROM t_state_huge").collect()}
    finally:
        q.stop()
    assert upd[1]["total_value"] == 5.0 and upd[1]["max_value"] == 5.0
    assert upd[2]["total_value"] is None and upd[2]["max_value"] is None