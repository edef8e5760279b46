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
