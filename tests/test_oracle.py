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
