"""flatten/unflatten compatibility round trip (parquetdb flat-layout analog)
and parquetdb-style tuple filters on PqDB.read."""

from __future__ import annotations

import tempfile

from pyspark.sql import types as T

from crystal_parquet_database_spark.db import PqDB
from crystal_parquet_database_spark.functions.flatten import (
    flatten_structs,
    unflatten_structs,
)


def test_flatten_unflatten_roundtrip(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "lattice",
                T.StructType(
                    [
                        T.StructField("a", T.DoubleType()),
                        T.StructField(
                            "inner", T.StructType([T.StructField("b", T.StringType())])
                        ),
                        T.StructField("pbc", T.ArrayType(T.BooleanType())),
                    ]
                ),
            ),
            T.StructField("species", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (1, (2.0, ("x",), [True, False]), ["Si", "O"]),
        (2, (3.0, (None,), None), None),
    ]
    df = spark.createDataFrame(rows, schema=schema)
    flat = flatten_structs(df)
    assert set(flat.columns) == {"id", "lattice.a", "lattice.inner.b", "lattice.pbc", "species"}
    back = unflatten_structs(flat)

    def erase_nullability(dt):
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, erase_nullability(f.dataType)) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(erase_nullability(dt.elementType))
        return dt

    # struct-level nullability is not representable in the flat layout (the
    # documented caveat) — field names/types/order must round-trip exactly
    assert erase_nullability(back.schema) == erase_nullability(df.schema)
    assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


def test_pqdb_tuple_filters(spark):
    with tempfile.TemporaryDirectory(prefix="pqdbf_") as d:
        db = PqDB(spark, d + "/db")
        db.create([{"x": i, "tag": f"t{i % 3}"} for i in range(30)])
        got = db.read(filters=[("x", ">=", 10), ("x", "<", 20), ("tag", "in", ["t0", "t1"])])
        vals = sorted(r["x"] for r in got.collect())
        assert vals == [v for v in range(10, 20) if v % 3 in (0, 1)]
        got2 = db.read(filters=[("tag", "not in", ["t0", "t1", "t2"])])
        assert got2.count() == 0
        import pytest

        with pytest.raises(ValueError, match="unsupported filter op"):
            db.read(filters=[("x", "like", "%")])


def test_flatten_guards_against_wrong_layout(spark):
    """Regression: already-flat input (dotted top-level names) raised an
    opaque AnalysisException or mangled columns; now a clear ValueError."""
    import pytest

    from crystal_parquet_database_spark.functions.flatten import (
        flatten_structs, unflatten_structs,
    )

    flat = spark.range(1).selectExpr("1 as `lattice.a`", "2 as b")
    with pytest.raises(ValueError, match="already has dotted"):
        flatten_structs(flat)
    conflict = spark.range(1).selectExpr("1 as a", "2 as `a.b`")
    with pytest.raises(ValueError, match="conflicts"):
        unflatten_structs(conflict)


def test_flatten_rejects_dotted_nested_field_name(spark):
    """Regression: a NESTED field whose name contains '.' cannot survive the
    dotted flat layout — it must raise, not crash in getField or silently
    alias a real nesting of the same spelled path."""
    import pytest

    from crystal_parquet_database_spark.functions.flatten import flatten_structs

    df = spark.range(1).selectExpr("named_struct('a.b', 1, 'c', 2) AS x")
    with pytest.raises(ValueError, match="a.b"):
        flatten_structs(df)
