"""The declared query surface: named (Spark query, DuckDB oracle SQL) pairs.

``QUERIES`` maps name → callable(spark, sf_dir) → DataFrame.
``ORACLES`` maps name → ANSI-ish SQL string DuckDB runs on the same parquet
tables. Importing this package populates both registries. The driver contract
(``__spark_entry__.py``) and ``bench.py`` both read from here.

Exactness contract (how every query guarantees a value-hash match against
DuckDB): aggregates over doubles are computed in decimal (exact and
order-independent in both engines), cast to double only afterwards, and any
post-aggregation arithmetic keeps an identical expression shape on both sides
— IEEE double ops on identical inputs are bit-identical across engines, so no
rounding fudge factors are needed anywhere.
"""

from crystal_parquet_database_spark.surface.registry import ORACLES, QUERIES, query

# populate registries
from crystal_parquet_database_spark.surface import relational  # noqa: E402,F401
from crystal_parquet_database_spark.surface import relational_ext  # noqa: E402,F401
from crystal_parquet_database_spark.surface import tpch_ext  # noqa: E402,F401
from crystal_parquet_database_spark.surface import tpch_complete  # noqa: E402,F401
from crystal_parquet_database_spark.surface import scalar  # noqa: E402,F401
from crystal_parquet_database_spark.surface import llm  # noqa: E402,F401
from crystal_parquet_database_spark.surface import streaming  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
