"""Driver-gated PqDB mutation surface: drive the database's write paths —
``upsert_scd2`` / ``read_asof`` and ``create``/``update``/``delete``/``read``
(db.py) — through the correctness gate, not just pytest.

Each query builds a REAL on-disk PqDB from fixture tables, mutates it
through the engine's own APIs, and returns the final read; the oracle
recomputes the same end state directly from the fixtures in plain SQL. Any
bug in the mutation machinery (mis-closed SCD2 row, forked duplicate current
version, lost history, wrong validity bounds, update hitting the wrong keys,
delete dropping NULL-predicate rows, broken projection/filter pushdown on
the read-back) flips the hash.

100 TB shape: the merges are db.py's (current ⋈ broadcast updates) joins and
partition-pruned rewrites — commentary there; this module binds them to
fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crystal_parquet_database_spark.surface.registry import query
from crystal_parquet_database_spark.surface.scratch import fresh_dir as _fresh_dir
from crystal_parquet_database_spark.tables import load_table

_E1 = "2024-01-01 00:00:00"
_E2 = "2024-02-01 00:00:00"

_SCD2_ORACLE = """
SELECT 'e1' AS asof, c_custkey AS key, c_mktsegment AS segment,
       c_acctbal AS balance,
       -- a NULL balance is UNCHANGED by the +100 update (NULL+100 = NULL,
       -- eqNullSafe true), so the engine correctly keeps that key current
       -- even when divisible by 3 — the oracle must agree (latent: the
       -- current customer fixture has no NULL c_acctbal, but sibling
       -- fixture tables carry injected NULLs)
       (c_custkey % 3 <> 0 OR c_acctbal IS NULL) AS is_current
FROM customer WHERE c_custkey < 50
UNION ALL
SELECT 'e2' AS asof, c_custkey AS key, c_mktsegment AS segment,
       CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END
         AS balance,
       TRUE AS is_current
FROM customer WHERE c_custkey < 60
"""


@query("scd2_asof_dimension", _SCD2_ORACLE)
def scd2_asof_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versioned merge + as-of time travel, oracle-checked end to end.

    Epoch 1 (2024-01-01): create the dimension from customers with key < 50.
    Epoch 2 (2024-02-01): type-2 merge an update set covering keys < 60 —
    keys divisible by 3 change balance (+100.0, the closed-and-reinserted
    rows), keys 50-59 are brand new, the rest are byte-identical no-ops.
    Result: read_asof(mid-January) ∪ read_asof(mid-February), each tagged.
    The e1 read must show changed keys as already-closed rows (is_current
    false) and must NOT contain the epoch-2 versions; the e2 read must show
    exactly one current row per key with the merged values.
    """
    from crystal_parquet_database_spark.db import PqDB

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("balance"),
    )
    db = PqDB(spark, _fresh_dir("scd2_dim"))
    db.create_versioned(cust.filter(F.col("key") < 50), effective_ts=_E1)
    updates = cust.filter(F.col("key") < 60).withColumn(
        "balance",
        F.when(F.col("key") % 3 == 0, F.col("balance") + F.lit(100.0)).otherwise(
            F.col("balance")
        ),
    )
    db.upsert_scd2(updates, on="key", effective_ts=_E2)

    def state(asof: str, tag: str) -> DataFrame:
        return db.read_asof(asof).select(
            F.lit(tag).alias("asof"),
            "key",
            "segment",
            "balance",
            F.col(db.VALID_TO).isNull().alias("is_current"),
        )

    return state("2024-01-15 00:00:00", "e1").unionByName(
        state("2024-02-15 00:00:00", "e2")
    )


_CRUD_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
FROM documents
WHERE doc_id < 200 AND doc_id % 7 <> 0
  AND CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000 ELSE n_chars END > 250
"""


@query("pqdb_update_delete_read", _CRUD_ORACLE)
def pqdb_update_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full PqDB CRUD cycle under the driver gate: create → update (by a
    NATURAL key, not the engine id) → delete (SQL predicate semantics) →
    filtered/projected read-back.

    Creates a dataset from documents with doc_id < 200, bumps n_chars by
    1000 for every doc_id divisible by 5 via ``update(on="doc_id")``,
    deletes every doc_id divisible by 7 via a ``where`` predicate, then
    reads back (doc_id, lang, n_chars) through the pushdown read with a
    residual n_chars filter (threshold near the fixture median, so the
    pushdown actually discards rows). The oracle replays create/update/delete/filter
    as plain SQL over the fixture — a wrong update join, a delete that eats
    NULL-predicate rows, or a filter that misses post-update values all
    flip the hash.
    """
    from crystal_parquet_database_spark.db import PqDB

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    db = PqDB(spark, _fresh_dir("pqdb_crud"))
    db.create(docs.filter(F.col("doc_id") < 200))
    bumps = (
        docs.filter((F.col("doc_id") < 200) & (F.col("doc_id") % 5 == 0))
        .select("doc_id", (F.col("n_chars") + F.lit(1000)).alias("n_chars"))
    )
    db.update(bumps, on="doc_id")
    db.delete(where="doc_id % 7 = 0")
    return db.read(
        columns=["doc_id", "lang", "n_chars"], filters=[("n_chars", ">", 250)]
    )
