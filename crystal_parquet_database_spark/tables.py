"""Access to the driver's TPC-H-ish test tables.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
``load_table`` returns a plain ``spark.read.parquet`` DataFrame so every
downstream select/filter benefits from native pushdown and pruning;
``register_views`` exposes them as temp views for the SQL-flavored operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The caller may hand us a session built without engine defaults (the
    # driver harness does); timestamp semantics must not depend on the host
    # timezone, so pin UTC at query-build time.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # On such a bare session the stock 200 shuffle partitions waste ~170
    # empty tasks per exchange at fixture scale. Only the untouched default
    # is lowered — an explicit user/cluster setting always wins (at real
    # scale shuffle parallelism is a deliberate cluster choice, not ours).
    # "Explicit" is detected from BOTH places a deliberate setting can
    # live: the SparkConf the context was built with (spark-defaults /
    # context builder) AND the session's SQLConf explicit-settings map
    # (session builder .config() and runtime spark.conf.set land there —
    # the runtime DEFAULT does not; same probe codegen_spans uses for the
    # AQE flag). The context-conf check alone missed a builder-set 200 on
    # a session attached to a pre-existing SparkContext — the exact
    # mechanism the old comment advertised as the way to pin it.
    key = "spark.sql.shuffle.partitions"
    explicitly_set = spark.sparkContext.getConf().get(key, None) is not None or bool(
        spark._jsparkSession.sessionState().conf().contains(key)
    )
    if not explicitly_set and spark.conf.get(key, "200") == "200":
        spark.conf.set(key, "32")
    if name == "events":
        # The events fixture stores ts as parquet TIMESTAMP(NANOS), which the
        # Spark vectorized reader rejects outright. Read nanos as int64 and
        # floor-divide to micros — integer division, NOT double division
        # (ns-since-epoch ~1.7e18 exceeds 2^53, a double round-trip corrupts
        # the low digits). Floor matches DuckDB's ns→µs truncation.
        # (Re-written copies of the table already carry a proper timestamp —
        # convert only when ts actually arrives as a long.)
        # NOTE: this conf intentionally stays set on the session (restoring it
        # after a lazy read races plan execution); its only observable effect
        # elsewhere is turning a hard PARQUET_TYPE_ILLEGAL error on other
        # NANOS columns into an int64 read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # `div` TRUNCATES toward zero — and that is deliberately the
            # semantic here, adjudicated empirically (round 7): DuckDB's
            # PARQUET READER converts TIMESTAMP(NANOS) to µs by truncation
            # (-1500 ns reads as -1 µs), and the oracle reads these tables
            # via read_parquet. (DuckDB's CAST from a timestamp_ns VALUE
            # floors instead — -1500 ns → -2 µs — but that path never sees
            # fixture data.) A floor here would diverge from the oracle on
            # any pre-epoch nanosecond not on a µs boundary; pinned in
            # tests/test_io.py::test_load_table_pre_epoch_nanos...
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer fixture copies store ts as parquet TIMESTAMP(MICROS)
            # without the UTC-adjusted flag, which Spark 4 infers as
            # TIMESTAMP_NTZ. Session tz is pinned UTC above, so casting to
            # TIMESTAMP maps wall-clock to the same instant DuckDB reads —
            # and restores unix_micros()/withWatermark compatibility.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view named after the table. ``names=None``
    means all tables; an explicit empty list is honored as a no-op."""
    for name in TABLE_NAMES if names is None else names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
