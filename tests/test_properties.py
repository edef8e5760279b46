"""Property-based tests (hypothesis) for the pieces whose correctness is a
mathematical contract: portable hashing parity and permissive type promotion."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crystal_parquet_database_spark.functions.portable_hash import (
    P,
    spark_hash64,
    sql_hash64,
)
from crystal_parquet_database_spark.schema import promote_type


def py_hash64(s: str) -> int:
    """Pure-Python oracle for the portable hash."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


printable = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\x00"), min_size=0, max_size=50
)


@settings(max_examples=200, deadline=None)
@given(printable)
def test_duckdb_hash_matches_python(s: str):
    got = duckdb.sql(f"SELECT {sql_hash64('?')}".replace("?", f"'{s}'")).fetchone()[0]
    assert got == py_hash64(s)


def test_spark_hash_matches_python(spark):
    import random

    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcdefghij XYZ0123") for _ in range(rng.randint(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(w,) for w in words], schema="s string")
    got = {r["s"]: r["h"] for r in df.select("s", spark_hash64(F.col("s")).alias("h")).collect()}
    for w in words:
        assert got[w] == py_hash64(w)


atomic_types = st.sampled_from(
    [
        T.IntegerType(),
        T.LongType(),
        T.DoubleType(),
        T.FloatType(),
        T.StringType(),
        T.BooleanType(),
        T.NullType(),
    ]
)


def struct_types(depth: int = 2):
    if depth == 0:
        return atomic_types
    inner = struct_types(depth - 1)
    return st.one_of(
        atomic_types,
        st.builds(T.ArrayType, inner),
        st.builds(
            lambda fields: T.StructType(
                [T.StructField(f"f{i}", t) for i, t in enumerate(fields)]
            ),
            st.lists(inner, min_size=1, max_size=3),
        ),
    )


@settings(max_examples=200, deadline=None)
@given(struct_types())
def test_promote_idempotent(t):
    assert promote_type(t, t) == t


@settings(max_examples=200, deadline=None)
@given(struct_types(), struct_types())
def test_promote_total_and_null_absorbing(a, b):
    m = promote_type(a, b)
    assert m is not None
    assert promote_type(T.NullType(), a) == a
    assert promote_type(a, T.NullType()) == a
    # promotion never loses struct fields
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        assert {f.name for f in a.fields} | {f.name for f in b.fields} == {
            f.name for f in m.fields
        }


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from([T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()]), min_size=2, max_size=2))
def test_promote_numeric_widens(ts):
    a, b = ts
    m = promote_type(a, b)
    rank = {"integer": 0, "long": 1, "float": 2, "double": 3}
    assert rank[m.typeName()] == max(rank[a.typeName()], rank[b.typeName()])
