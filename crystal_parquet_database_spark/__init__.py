"""crystal_parquet_database_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo lllangWV/Crystal-Parquet-Database (an ELT library over nested
Parquet delegating storage/query to parquetdb), rebuilt Spark-first:

- ``db.PqDB``          — Parquet dataset wrapper (create/read/normalize/stats),
                         the Spark re-expression of parquetdb's CRUD surface.
- ``schema``           — canonical nested crystal schema + permissive
                         unify/cast helpers (reference: crystpqdb/db.py).
- ``sources``          — loader framework (reference: crystpqdb/loaders/).
- ``operators``        — declared relational + LLM-pipeline query surface.
- ``functions``        — reusable column-level helpers (vector math, nested
                         extraction, portable hashing).
- ``streaming``        — Structured Streaming recipes over event tables.
- ``plans``            — plan inspection, layout normalization, footer stats.
- ``surface``          — the registry of (query, oracle-SQL) pairs consumed by
                         ``__spark_entry__.py`` and ``bench.py``.
"""

from crystal_parquet_database_spark.db import PqDB
from crystal_parquet_database_spark.schema import crystal_schema, to_canonical
from crystal_parquet_database_spark.session import get_spark
from crystal_parquet_database_spark.tables import TABLE_NAMES, load_table, register_views

__all__ = [
    "PqDB",
    "crystal_schema",
    "to_canonical",
    "get_spark",
    "TABLE_NAMES",
    "load_table",
    "register_views",
]
