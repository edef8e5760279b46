"""Source/sink surface tests: CSV/JSON round trips, partitioned writes with
pruning, file sizing."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from crystal_parquet_database_spark.plans.inspect import formatted_plan
from crystal_parquet_database_spark.sources.io import read_table, write_table
from crystal_parquet_database_spark.tables import load_table
from crystal_parquet_database_spark.testing import canon_frame


@pytest.fixture()
def tmp(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip(spark, sf_dir, tmp):
    nation = load_table(spark, sf_dir, "nation")
    write_table(nation, f"{tmp}/nation_csv", fmt="csv")
    back = read_table(spark, f"{tmp}/nation_csv", fmt="csv")
    assert canon_frame(back.toPandas()) == canon_frame(nation.toPandas())


def test_json_roundtrip_with_compression(spark, sf_dir, tmp):
    region = load_table(spark, sf_dir, "region")
    write_table(region, f"{tmp}/region_json", fmt="json", compression="gzip")
    assert glob.glob(f"{tmp}/region_json/*.json.gz")
    back = read_table(spark, f"{tmp}/region_json", fmt="json")
    assert canon_frame(back.select("r_regionkey", "r_name").toPandas()) == canon_frame(
        region.toPandas()
    )


def test_partitioned_write_prunes(spark, sf_dir, tmp):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    write_table(orders, f"{tmp}/orders_part", partition_by=["year"])
    years = {
        os.path.basename(p)
        for p in glob.glob(f"{tmp}/orders_part/year=*")
    }
    assert len(years) >= 5
    back = read_table(spark, f"{tmp}/orders_part").filter(F.col("year") == 2000)
    plan = formatted_plan(back)
    assert "PartitionFilters: [isnotnull(year" in plan.replace("#", "").replace(")", "") or (
        "PartitionFilters" in plan and "year" in plan
    )
    assert back.count() == orders.filter(F.col("year") == 2000).count()


def test_max_records_per_file(spark, sf_dir, tmp):
    part = load_table(spark, sf_dir, "part")  # 2000 rows
    write_table(part, f"{tmp}/part_sized", max_records_per_file=500, n_files=1)
    files = glob.glob(f"{tmp}/part_sized/*.parquet")
    assert len(files) == 4


def test_orc_roundtrip(spark, sf_dir, tmp):
    supplier = load_table(spark, sf_dir, "supplier")
    write_table(supplier, f"{tmp}/supplier_orc", fmt="orc")
    back = read_table(spark, f"{tmp}/supplier_orc", fmt="orc")
    assert canon_frame(back.toPandas()) == canon_frame(supplier.toPandas())


def test_read_rejects_unknown_format(spark, tmp):
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, tmp, fmt="avro")


def test_load_table_pre_epoch_nanos_truncation_matches_duckdb(spark, tmp_path):
    """DuckDB's PARQUET READER converts TIMESTAMP(NANOS) to us by TRUNCATION
    toward zero (-1500 ns reads as -1 us) -- unlike its CAST from a
    timestamp_ns value, which floors. The oracle reads fixtures via
    read_parquet, so Spark's `ts div 1000` truncation is the correct mirror;
    this pins the equivalence across pre-epoch, boundary, and modern
    values."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sfx"
    d.mkdir()
    ns_values = [-1500, -1, 0, 999, 1500, 1_700_000_000_123_456_789]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ns_values)), pa.int64()),
            "ts": pa.array(ns_values, pa.timestamp("ns")),
            "user_id": pa.array([1] * len(ns_values), pa.int64()),
            "event_type": pa.array(["click"] * len(ns_values)),
            "value": pa.array([1.0] * len(ns_values)),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))

    from crystal_parquet_database_spark.tables import load_table

    got = {
        r["event_id"]: r["ts"]
        for r in load_table(spark, str(d), "events").collect()
    }
    con = duckdb.connect()
    want = {
        eid: ts
        for eid, ts in con.sql(
            "SELECT event_id, ts FROM "
            f"read_parquet('{d}/events.parquet')"
        ).fetchall()
    }
    con.close()
    for eid in got:
        assert got[eid].replace(tzinfo=None) == want[eid], (eid, got[eid], want[eid])
