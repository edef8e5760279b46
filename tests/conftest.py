from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crystal_parquet_database_spark.session import get_spark

# Small local session for tests: 4 threads, 4 shuffle partitions.
TEST_SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    meta = str(tmp_path_factory.mktemp("metastore"))
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # keep bucketed-table tests from littering the repo root
            "spark.sql.warehouse.dir": wh,
            "spark.hadoop.javax.jdo.option.ConnectionURL": f"jdbc:derby:;databaseName={meta}/db;create=true",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
