"""Property tests for nested extraction ops (A9-A11) against a pure-Python
oracle, on randomized crystal-shaped sites arrays (SURVEY.md §5 item iv)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crystal_parquet_database_spark.functions.nested import (
    list_struct_field,
    pack_struct,
    site_elements,
    site_elements_flat,
    struct_field,
)
from crystal_parquet_database_spark.schema import site_struct

ELEMENTS = ["H", "C", "O", "Si", "Fe", "Na", "Cl", "A", "B"]


def make_sites(rng: random.Random, max_species: int = 1) -> list[dict]:
    n = rng.randint(1, 8)
    sites = []
    for _ in range(n):
        n_sp = rng.randint(1, max_species)
        sites.append(
            {
                "species": [
                    {"element": rng.choice(ELEMENTS), "occu": 1} for _ in range(n_sp)
                ],
                "abc": [rng.random() for _ in range(3)],
                "xyz": [rng.random() * 10 for _ in range(3)],
                "properties": {"magmom": rng.random(), "charge": 0.0, "forces": [0.0] * 3},
                "label": "x",
            }
        )
    return sites


@pytest.fixture(scope="module")
def sites_df(spark):
    rng = random.Random(42)
    rows = [(i, make_sites(rng, max_species=3)) for i in range(60)]
    schema = T.StructType(
        [T.StructField("rid", T.LongType()), T.StructField("sites", T.ArrayType(site_struct))]
    )
    df = spark.createDataFrame(rows, schema=schema)
    return df, rows


def test_list_struct_field_matches_python(sites_df):
    """A10: sites[].xyz with per-row offsets preserved."""
    df, rows = sites_df
    got = {r["rid"]: r["v"] for r in df.select("rid", list_struct_field("sites", "xyz").alias("v")).collect()}
    for rid, sites in rows:
        assert got[rid] == [s["xyz"] for s in sites]


def test_site_elements_matches_python(sites_df):
    """A11 (intended semantics): first species element per site."""
    df, rows = sites_df
    got = {r["rid"]: r["v"] for r in df.select("rid", site_elements("sites").alias("v")).collect()}
    for rid, sites in rows:
        assert got[rid] == [s["species"][0]["element"] for s in sites]


def test_site_elements_flat_matches_python(sites_df):
    """A11 (faithful recursive flatten): all elements across sites."""
    df, rows = sites_df
    got = {r["rid"]: r["v"] for r in df.select("rid", site_elements_flat("sites").alias("v")).collect()}
    for rid, sites in rows:
        assert got[rid] == [sp["element"] for s in sites for sp in s["species"]]


def test_struct_field_path(spark):
    df = spark.createDataFrame([((("deep",),),)], schema="a struct<b:struct<c:string>>")
    assert df.select(struct_field("a", "b", "c").alias("v")).collect()[0]["v"] == "deep"


def test_pack_struct_roundtrip(spark):
    df = spark.createDataFrame([(1, "x")], schema="a int, b string")
    out = pack_struct(df, ["a", "b"], "s")
    assert out.columns == ["s"]
    row = out.collect()[0]
    assert row["s"]["a"] == 1 and row["s"]["b"] == "x"


def test_rename_columns_simultaneous_no_cascade(spark):
    """Regression: sequential withColumnRenamed cascades ({'a':'b','b':'c'}
    renamed a's output twice; swaps collapsed columns). Renames apply
    simultaneously; collisions raise."""
    import pytest

    from crystal_parquet_database_spark.functions.nested import rename_columns

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    out = rename_columns(df, {"a": "b", "b": "c"})
    assert out.columns == ["b", "c"]
    assert out.collect()[0].asDict() == {"b": 1, "c": 2}
    swapped = rename_columns(df, {"a": "b", "b": "a"})
    assert swapped.columns == ["b", "a"]
    assert swapped.collect()[0].asDict() == {"b": 1, "a": 2}
    with pytest.raises(ValueError, match="duplicate"):
        rename_columns(df, {"a": "b"})  # collides with existing b
