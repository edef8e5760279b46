"""Edge-behavior regressions for the round-7 post-sweep fixes: char-shingle
NULL parity, ANSI-safe first-species extraction, and the engine-identical
JSON string→int conversion (surface/scalar.py's FLOOR(TRY_CAST) contract)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crystal_parquet_database_spark.functions.nested import site_elements
from crystal_parquet_database_spark.functions.portable_hash import (
    spark_shingles,
    sql_shingles,
)
from crystal_parquet_database_spark.schema import site_struct


@pytest.mark.parametrize(
    "text",
    [None, "", "ab", "abcdef", "hello world hello", "aaaaaaa"],
)
def test_char_shingles_engine_parity(spark, text):
    """spark_shingles == DuckDB sql_shingles as SETS for every input shape —
    including NULL text, where Spark's array_distinct KEEPS the NULL element
    the transform produces while DuckDB's list_distinct drops it: the
    array_compact makes both sides []."""
    df = spark.createDataFrame([(text,)], schema="t string")
    got = df.select(spark_shingles(F.col("t"), 5).alias("sh")).collect()[0]["sh"]
    want = (
        duckdb.connect()
        .execute(
            f"SELECT {sql_shingles('t', 5)} AS sh FROM (SELECT CAST(? AS VARCHAR) AS t)",
            [text],
        )
        .fetchone()[0]
    )
    assert got is not None and None not in got, "NULL element must never survive"
    assert sorted(got) == sorted(want)


def test_site_elements_empty_species_is_null_not_abort(spark):
    """A site with an EMPTY species list yields a NULL element — under ANSI
    mode a plain element_at(species, 1) throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT
    and aborts the whole loader job; try_element_at degrades that one site."""
    schema = T.StructType(
        [T.StructField("rid", T.LongType()), T.StructField("sites", T.ArrayType(site_struct))]
    )
    sites = [
        {"species": [], "abc": [0.0] * 3, "xyz": [0.0] * 3, "properties": None, "label": "e"},
        {
            "species": [{"element": "Si", "occu": 1}],
            "abc": [0.0] * 3,
            "xyz": [0.0] * 3,
            "properties": None,
            "label": "s",
        },
    ]
    df = spark.createDataFrame([(1, sites)], schema=schema)
    got = df.select(site_elements("sites").alias("v")).collect()[0]["v"]
    assert got == [None, "Si"]


@pytest.mark.parametrize(
    "raw",
    ["12", "12.5", "-12.5", "0.999", "abc", "", "1e2", "-3", None],
)
def test_floor_trycast_int_conversion_engine_parity(spark, raw):
    """FLOOR(TRY_CAST(s AS DOUBLE)) → INT is the one string→int spelling with
    identical semantics on both engines (surface/scalar.py): Spark's ANSI
    string→int cast aborts on '12.5' where DuckDB rounds to 13, and Spark's
    double→int cast truncates toward zero where DuckDB's rounds."""
    df = spark.createDataFrame([(raw,)], schema="s string")
    got = df.select(
        F.floor(F.col("s").try_cast("double")).cast("int").alias("v")
    ).collect()[0]["v"]
    want = (
        duckdb.connect()
        .execute("SELECT CAST(FLOOR(TRY_CAST(CAST(? AS VARCHAR) AS DOUBLE)) AS INTEGER) AS v", [raw])
        .fetchone()[0]
    )
    assert got == want
