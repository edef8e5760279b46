"""Mimics the driver's correctness gate: every surface query with an oracle
must match DuckDB exactly (order-insensitive, bit-exact values) at sf0.01."""

from __future__ import annotations

import pytest

from crystal_parquet_database_spark.surface import ORACLES, QUERIES
from crystal_parquet_database_spark.testing import compare_query, duckdb_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, duck):
    ok, msg = compare_query(spark, name, sf_dir, con=duck)
    assert ok, msg


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_canon_null_timestamps_match_across_engine_dtypes():
    """Spark toPandas renders an all-NULL timestamp column as object-dtype
    None; DuckDB .df() renders it as datetime64 NaT. Both must canonicalize
    to the NULL sentinel — NaTType subclasses datetime, so an isoformat()
    branch reached first would render the string 'NaT' and falsely mismatch
    (a real bug: canon_cell's NaT check used to sit below the datetime one)."""
    import pandas as pd

    from crystal_parquet_database_spark.testing import NULL, canon_cell, canon_frame

    assert canon_cell(pd.NaT) == NULL
    assert canon_cell(None) == NULL
    spark_side = pd.DataFrame({"ts": pd.Series([None], dtype=object)})
    duck_side = pd.DataFrame({"ts": pd.Series([pd.NaT], dtype="datetime64[us]")})
    assert canon_frame(spark_side) == canon_frame(duck_side)
    # non-null timestamps still isoformat
    t = pd.Timestamp("2026-01-02T03:04:05")
    assert canon_cell(t) == "2026-01-02T03:04:05"


def test_driver_safe_schema_guard_trips_on_complex_columns(spark):
    """The guard that prevents the round-1/round-6 regression: any
    driver-gated query returning a top-level Array/Map/Struct column must be
    rejected before it reaches the driver (whose canon dies on list cells)."""
    from pyspark.sql import functions as F

    from crystal_parquet_database_spark.surface.registry import (
        assert_driver_safe_schema,
    )

    bad = spark.range(3).select("id", F.array(F.lit("a"), F.lit("b")).alias("xs"))
    with pytest.raises(TypeError, match="complex-typed"):
        assert_driver_safe_schema("deliberate_array_query", bad)
    ok = bad.select("id", F.array_join("xs", ",").alias("xs"))
    assert_driver_safe_schema("serialized_query", ok)
    # registry-wide coverage: compare_query runs this guard for every
    # oracle-paired query, so test_oracle_match above IS the sweep — a
    # separate build-everything pass would re-execute the gated queries'
    # on-disk writes for zero added protection
