"""Skew/bucketing operators: result parity with the naive forms, and the
shuffle-elimination property of bucketed joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crystal_parquet_database_spark.operators.skew import (
    bucketed_join,
    salted_agg_count,
    salted_join,
    write_bucketed,
)
from crystal_parquet_database_spark.plans.inspect import join_strategies, num_shuffles
from crystal_parquet_database_spark.tables import load_table
from crystal_parquet_database_spark.testing import canon_frame


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    plain = li.join(part, "l_partkey").agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q")
    )
    salted = salted_join(li, part, "l_partkey", n_salts=8).agg(
        F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q")
    )
    assert canon_frame(salted.toPandas()) == canon_frame(plain.toPandas())


def test_salted_join_rejects_small_preserving_joins(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    with pytest.raises(ValueError, match="salt replicas"):
        salted_join(li, part, "l_partkey", how="full")
    with pytest.raises(ValueError, match="salt replicas"):
        salted_join(li, part, "l_partkey", how="right")


def test_salted_join_left_anti_matches_plain(spark, sf_dir):
    """Anti join through salting: a big row matches iff its one salt bucket
    has the key — equivalent to the plain anti join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    half = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 2 == 0)
        .withColumnRenamed("p_partkey", "l_partkey")
    )
    plain = li.join(half, "l_partkey", "left_anti").count()
    salted = salted_join(li, half, "l_partkey", n_salts=8, how="left_anti").count()
    assert salted == plain > 0


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    salted = salted_agg_count(ev, "event_type", n_salts=8)
    assert canon_frame(salted.toPandas()) == canon_frame(plain.toPandas())


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(orders, "orders_b", "custkey", n_buckets=8)
    write_bucketed(cust, "cust_b", "custkey", n_buckets=8)
    yield "orders_b", "cust_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join strategy decision is about bucketing
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "custkey")
        assert num_shuffles(joined) == 0  # co-bucketed: sort-merge without exchange
        assert "SortMergeJoin" in join_strategies(joined)
        # and it computes the right thing
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_zorder_key_bit_budget_shrinks_to_fit_long(spark):
    """4 cols × default 16 bits would overflow into the sign bit; the key
    must stay non-negative (i.e. bits_per_dim silently shrinks to 63//4)."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.operators.skew import zorder_key

    df = spark.range(1000).select(
        (F.col("id") % 10).alias("a"),
        (F.col("id") % 7).alias("b"),
        (F.col("id") % 5).alias("c"),
        (F.col("id") % 3).alias("d"),
    )
    out, key = zorder_key(df, ["a", "b", "c", "d"])
    assert out.filter(F.col(key) < 0).count() == 0
    # ordering by the key must still interleave all four dims (distinct keys)
    assert out.select(key).distinct().count() > 1


def test_zorder_key_all_null_and_empty_columns(spark):
    """An all-null column (min/max agg returns nulls) must not raise — the
    dimension degrades to a constant plane."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.operators.skew import zorder_key

    df = spark.range(100).select(
        F.col("id").alias("x"), F.lit(None).cast("double").alias("y")
    )
    out, key = zorder_key(df, ["x", "y"], bits_per_dim=8)
    assert out.filter(F.col(key).isNull()).count() == 0
    # and an empty frame works end to end
    empty, ekey = zorder_key(df.filter("x < 0"), ["x", "y"], bits_per_dim=8)
    assert empty.count() == 0


def test_zorder_key_handles_dates_and_nulls(spark):
    """Regression: zorder_key raised TypeError on date/timestamp dimensions
    (float() on a datetime aggregate), and NULL values landed in the TOP
    bucket because F.least skips nulls — they belong in a neutral low bucket."""
    import datetime as dt

    from crystal_parquet_database_spark.operators.skew import zorder_key

    rows = [
        (dt.date(2024, 1, 1), 0),
        (dt.date(2024, 6, 1), 500),
        (dt.date(2024, 12, 31), 999),
        (None, 250),
    ]
    df = spark.createDataFrame(rows, "d date, x int")
    out, col = zorder_key(df, ["d", "x"], bits_per_dim=8)
    got = {(r["d"], r["x"]): r[col] for r in out.collect()}
    assert all(v is not None for v in got.values())
    # z-order is monotone along the diagonal of this data
    assert got[(dt.date(2024, 1, 1), 0)] < got[(dt.date(2024, 12, 31), 999)]
    # the NULL-date row must NOT exceed keys whose date bucket is maximal
    assert got[(None, 250)] < got[(dt.date(2024, 12, 31), 999)]


def test_zorder_key_nan_inf_do_not_collapse_dimension(spark):
    """Regression: one NaN in a dimension made max()=NaN -> span=NaN (truthy,
    so the `or 1.0` guard never fired) -> every row bucket-0 — the dimension
    silently dropped out of the Z-order. Finite rows must still spread;
    NaN/-inf land in bucket 0, +inf in the top bucket."""
    import math

    from crystal_parquet_database_spark.operators.skew import zorder_key

    rows = [(1, 0.0), (2, 100.0), (3, math.nan), (4, math.inf), (5, -math.inf)]
    df = spark.createDataFrame(rows, "id long, x double")
    keyed, col = zorder_key(df, ["x"], bits_per_dim=4)
    z = {r["id"]: r[col] for r in keyed.collect()}
    assert z[1] != z[2]          # finite values still differentiate
    assert z[3] == 0 and z[5] == 0   # NaN and -inf: bucket 0
    assert z[4] == 15            # +inf: top bucket (2^4 - 1)
    assert z[2] == 15            # max finite value: top bucket


def test_session_seq_accepts_timestamp_ntz(spark):
    """The shared sessionizer must take NTZ timestamps like zorder_key does
    (unix_micros alone rejects timestamp_ntz)."""
    from crystal_parquet_database_spark.operators.sessionize import with_session_seq

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1), (2, "2024-01-01 02:00:00", 1)],
        "event_id long, ts string, user_id long",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "user_id")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = {r["event_id"]: r["session_seq"] for r in with_session_seq(df, 30).collect()}
    assert out == {1: 1, 2: 2}  # 2h gap opens a second session


def test_salted_ops_reject_reserved_salt_column(spark):
    """A caller column named __salt would be silently overwritten (big side)
    or duplicated into AMBIGUOUS_REFERENCE (small side) — both must fail
    loudly at the API boundary."""
    import pytest

    from crystal_parquet_database_spark.operators.skew import salted_agg_count, salted_join

    big = spark.createDataFrame([(1, 9)], "k long, __salt long")
    small = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(big, small, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(small.withColumnRenamed("k", "k2").withColumnRenamed("k2", "k"),
                    big, "k")
    with pytest.raises(ValueError, match="__salt"):
        salted_agg_count(big, "k")


def test_content_salt_degenerate_without_entropy_cols(spark):
    """The documented failure mode (skew.py:_content_salt docstring) must be
    TRUE: byte-identical hot-key rows hash to ONE salt when no entropy_cols
    are given — the hot key stays on a single reducer — and spread once a
    unique column is named. If someone 'fixes' the salt to include row
    position (the SPARK-23207 retry-corruption class) or the docs lie about
    the degenerate case, this fails."""
    from crystal_parquet_database_spark.operators.skew import _content_salt

    n = 512
    hot = spark.range(n).select(
        F.lit("hotkey").alias("k"), F.lit("same-payload").alias("v"), F.col("id").alias("uid")
    )
    identical = hot.select("k", "v")  # byte-identical rows: no entropy
    no_entropy = identical.select(
        _content_salt(identical, None, 16).alias("s")
    ).distinct().count()
    assert no_entropy == 1  # degenerate: one salt, one reducer

    with_entropy = hot.select(
        _content_salt(hot, ["uid"], 16).alias("s")
    ).distinct().count()
    assert with_entropy == 16  # unique id spreads the hot key over all salts


def test_salted_join_degenerate_rows_still_correct(spark):
    """Even in the degenerate one-salt case the RESULT is correct — salting
    only loses the spread, never rows."""
    big = spark.range(200).select(F.lit("hk").alias("k"), F.lit("x").alias("v"))
    small = spark.createDataFrame([("hk", 1)], "k string, w int")
    out = salted_join(big, small, "k", n_salts=8)
    assert out.count() == 200
