"""Driver simulation: exercise the contract exactly as the harness would —
plain SparkSession (no engine defaults), import __spark_entry__, run entry(),
then every queries() entry at sf0.01 side-by-side with oracle_sql() in DuckDB,
order-insensitive value compare."""

import os
import sys
import hashlib

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

# deliberately bare session — like the driver would build, no engine configs
spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as ep

# 1) smoke: entry() on sf0.001
df = ep.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema: {[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2) full contract at sf0.01 vs duckdb
import duckdb

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

# ONE canonicalizer, shared with the in-package harness (testing.py) — a
# second hand copy here drifted once (no bytes→hex branch, no NaT-as-NULL)
# and could pass what the package harness fails, or vice versa
from crystal_parquet_database_spark.testing import canon_frame as canon

from crystal_parquet_database_spark.surface.registry import assert_driver_safe_schema

qs, os_ = ep.queries(), ep.oracle_sql()
fails = []
for name in sorted(qs):
    frame = qs[name](spark, SF)
    if name in os_:
        # the real driver's canon sorts RAW cell values — complex-typed
        # top-level columns crash it; fail here the way the driver would
        try:
            assert_driver_safe_schema(name, frame)
        except TypeError as e:
            fails.append(name)
            print(f"{name:45s} SCHEMA-GUARD {e}")
            continue
    sdf = frame.toPandas()
    if name in os_:
        ddf = con.sql(os_[name]).df()
        # the real driver checks SCHEMA as well as values — a query whose
        # values match under the wrong column names must fail here too
        if sorted(sdf.columns) != sorted(ddf.columns):
            fails.append(name)
            print(
                f"{name:45s} COL-MISMATCH spark={sorted(sdf.columns)} "
                f"duckdb={sorted(ddf.columns)}"
            )
            continue
        a, b = canon(sdf), canon(ddf)
        ha = hashlib.sha256(str(a).encode()).hexdigest()[:12]
        hb = hashlib.sha256(str(b).encode()).hexdigest()[:12]
        status = "MATCH" if a == b else "MISMATCH"
        if a != b: fails.append(name)
        print(f"{name:45s} {status} rows={len(a)}/{len(b)} hash={ha}/{hb}")
    else:
        print(f"{name:45s} rows-only rows={len(sdf)}")
    # between-queries hygiene, mirroring bench.py: release each query's
    # eager-localCheckpoint blocks deterministically so a 150-query sweep
    # doesn't accumulate session-lifetime block-manager pressure
    from crystal_parquet_database_spark.runtime import release_all_session_blocks

    release_all_session_blocks(spark)

# 3) probes
# re-run a query twice on the same session (idempotence)
r1 = qs["q1_pricing_summary"](spark, SF).toPandas()
r2 = qs["q1_pricing_summary"](spark, SF).toPandas()
print("repeat-run identical:", canon(r1) == canon(r2))
# run against a different sf dir
r3 = qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001").toPandas()
print("sf0.001 run rows:", len(r3))
# bogus sf dir -> should raise cleanly
try:
    qs["q1_pricing_summary"](spark, "/root/testdata/nope").toPandas()
    print("bogus dir: NO ERROR (unexpected)")
except Exception as e:
    print("bogus dir raises:", type(e).__name__, str(e).splitlines()[0][:100])

print("FAILS:", fails if fails else "none")
sys.exit(1 if fails else 0)
