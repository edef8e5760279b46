"""Self-verification harness: run a surface query on Spark AND its oracle SQL
on DuckDB over the same parquet tables, canonicalize both results, and demand
exact equality — the same bar as the driver's order-insensitive value-hash.

Canonical form: columns sorted by name, every cell rendered to a canonical
string (floats via repr of the double — so only bit-identical floats match),
rows sorted. No tolerance windows anywhere: the surface queries are built so
both engines produce identical bits (see surface/__init__ docstring).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from crystal_parquet_database_spark.surface import ORACLES, QUERIES
from crystal_parquet_database_spark.tables import TABLE_NAMES

NULL = "∅"


def canon_cell(x) -> str:
    # NaT FIRST: NaTType subclasses datetime, so the datetime branch below
    # would otherwise render it via isoformat() as the string 'NaT' — which
    # falsely mismatches an engine that yields None for the same NULL
    # (Spark toPandas gives None in object columns; DuckDB .df() gives NaT
    # in datetime64 columns).
    if x is None or x is pd.NaT:
        return NULL
    if isinstance(x, (np.ndarray, list, tuple)):
        return "[" + ",".join(canon_cell(v) for v in x) + "]"
    if isinstance(x, (bool, np.bool_)):
        return "T" if x else "F"
    if isinstance(x, (float, np.floating)):
        d = float(x)
        if math.isnan(d):
            return NULL
        return repr(d)
    if isinstance(x, (int, np.integer)):
        return str(int(x))
    if isinstance(x, (pd.Timestamp, _dt.datetime, _dt.date)):
        return x.isoformat()
    if isinstance(x, bytes):
        return x.hex()
    return str(x)


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written "table.parquet" is a DIRECTORY of part files
            # (the scale-replica dirs) — DuckDB needs the glob form there,
            # while the single-file fixtures keep the plain path
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    con=None,
    query_fn=None,
    oracle: str | None = None,
) -> tuple[bool, str]:
    """Returns (ok, message). Message contains the first few diffs on failure.

    ``query_fn``/``oracle`` default to the package registries; the driver
    simulation injects the entries it read from ``__spark_entry__`` instead,
    so the sim exercises the real contract module while the comparison
    protocol itself (schema guard, column check, canon, equality) has ONE
    definition — a second hand copy of it drifted once (scripts/driver_sim).
    """
    from crystal_parquet_database_spark.surface.registry import assert_driver_safe_schema

    frame = (query_fn or QUERIES[name])(spark, sf_dir)
    # fail the way the real driver would: its canon sorts raw cell values,
    # so complex-typed top-level columns crash it before any comparison
    try:
        assert_driver_safe_schema(name, frame)
    except TypeError as e:
        return False, f"{name}: SCHEMA-GUARD {e}"
    spark_pdf = frame.toPandas()
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        duck_pdf = con.sql(oracle if oracle is not None else ORACLES[name]).df()
    finally:
        if own_con:
            con.close()

    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, (
            f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
            f"duckdb={sorted(duck_pdf.columns)}"
        )
    a, b = canon_frame(spark_pdf), canon_frame(duck_pdf)
    if len(a) != len(b):
        return False, f"{name}: row count spark={len(a)} duckdb={len(b)}"
    diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
    if diffs:
        i, x, y = diffs[0]
        return False, (
            f"{name}: {len(diffs)}/{len(a)} rows differ; first at sorted-row {i}:\n"
            f"  cols : {sorted(spark_pdf.columns)}\n  spark: {x}\n  duck : {y}"
        )
    return True, f"{name}: OK ({len(a)} rows)"
