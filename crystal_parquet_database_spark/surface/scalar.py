"""Scalar-function query surface: string, date/time, math, array, JSON,
conditional expressions — all JVM-side built-ins (whole-stage codegen), no
Python UDFs.

Portability notes baked into the oracles: DuckDB `ceil/floor` return DOUBLE
while Spark returns BIGINT (cast); DuckDB `len(list)`/`datediff` return BIGINT
while Spark returns INT (cast); DuckDB regexp_replace needs the 'g' flag to
match Spark's replace-all. Math surface sticks to IEEE-exact ops (sqrt, abs,
mod, ceil/floor) — transcendental functions (ln, pow) are libm-dependent and
not bit-portable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crystal_parquet_database_spark.surface.registry import query
from crystal_parquet_database_spark.tables import load_table

_STRING_ORACLE = r"""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_type) AS type_upper,
       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
       p_brand || ':' || p_type AS brand_type,
       STRING_SPLIT(p_name, ' ')[1] AS first_word,
       REGEXP_EXTRACT(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
       REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
       SUBSTRING(p_type, 1, 3) AS type_prefix,
       TRIM(p_name, ' ') AS name_trim
FROM part
WHERE p_name LIKE '%e%'
"""


@query("scalar_string_functions", _STRING_ORACLE)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").alias("name_len"),
        # F.concat (not concat_ws): the oracle's || propagates NULL, while
        # concat_ws silently DROPS null arguments — NULL-faithful on both sides
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        F.trim("p_name").alias("name_trim"),
    )


_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
       CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
       -- explicit TIMESTAMP: DuckDB's DATE_TRUNC('month', ts) returns DATE,
       -- and only pandas' DATE->datetime64 rendering made the compare pass
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER) AS days_to_2002,
       CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m,
       CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01'
"""


@query("scalar_date_functions", _DATE_ORACLE)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias("days_to_2002"),
        # dates emitted as timestamps on both sides: pandas/duckdb render DATE
        # inconsistently (datetime.date vs datetime64), which breaks value-hashing
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


_MATH_ORACLE = """
SELECT p_partkey,
       SQRT(p_retailprice) AS price_sqrt,
       ABS(p_retailprice - 1000.0) AS price_dev,
       CAST(CEIL(p_retailprice) AS DOUBLE) AS price_ceil,
       CAST(FLOOR(p_retailprice) AS DOUBLE) AS price_floor,
       p_size % 7 AS size_mod7,
       p_retailprice * p_retailprice AS price_sq,
       GREATEST(p_size, 25) AS size_hi,
       LEAST(p_size, 25) AS size_lo
FROM part
"""


@query("scalar_math_functions", _MATH_ORACLE)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        (F.col("p_size") % 7).alias("size_mod7"),
        (F.col("p_retailprice") * F.col("p_retailprice")).alias("price_sq"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
        F.least("p_size", F.lit(25)).alias("size_lo"),
    )


_ARRAY_ORACLE = """
SELECT vec_id,
       CAST(LEN(embedding) AS INTEGER) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) AS first_two_sum,
       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INTEGER) AS n_positive
FROM embeddings
"""


@query("scalar_array_functions", _ARRAY_ORACLE)
def scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array built-ins + a higher-order filter (JVM-side lambda, no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    # F.get, not element_at: a zero-LENGTH embedding (failed encoder emits
    # [] as readily as NULL) ANSI-aborts element_at's out-of-bounds index,
    # while the oracle's [1] quietly returns NULL — F.get is the ragged-safe
    # NULL-returning access both engines agree on (the r9 KLL idiom)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.get("embedding", 0).cast("double").alias("first_component"),
        (
            F.get("embedding", 0).cast("double")
            + F.get("embedding", 1).cast("double")
        ).alias("first_two_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


_JSON_ORACLE = """
SELECT event_id, event_type,
       JSON_EXTRACT_STRING(props, '$.k') AS k_str,
       CAST(FLOOR(TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE)) AS INTEGER)
         AS k_int
FROM events
WHERE JSON_EXTRACT_STRING(props, '$.k') IS NOT NULL
  AND CAST(FLOOR(TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE)) AS INTEGER) > 50
"""


@query("scalar_json_extraction", _JSON_ORACLE)
def scalar_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props string column.

    The integer conversion is FLOOR(TRY_CAST(... AS DOUBLE)) on BOTH sides
    — the only spelling with identical semantics for every input: a direct
    string→int cast aborts the whole Spark job on '12.5' under ANSI mode
    while DuckDB rounds it to 13 (and Spark's double→int truncates where
    DuckDB's rounds, so routing through double alone diverges too);
    floor-of-double is engine-identical, and non-numeric strings NULL out
    on both. Integral values (all the fixture produces) are unaffected.
    (Contract: values beyond 2^53 would lose precision in the double hop —
    event props are small counters, far below that.)"""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    k_int = F.floor(k.try_cast("double")).cast("int")
    return (
        ev.withColumn("k_str", k)
        .withColumn("k_int", k_int)
        .filter(F.col("k_str").isNotNull() & (F.col("k_int") > 50))
        .select("event_id", "event_type", "k_str", "k_int")
    )


_MAP_ORACLE = """
SELECT event_id, k.key AS key,
       CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.' || k.key) AS DOUBLE))
            AS INTEGER) AS value
FROM events, unnest(json_keys(props)) k(key)
WHERE event_id < 100
"""


@query("scalar_map_functions", _MAP_ORACLE)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → MapType → exploded (key, value) rows.

    Parsed as map<string,string> with the same FLOOR(TRY_CAST(... AS
    DOUBLE)) integer conversion as ``scalar_json_extraction`` (and for the
    same reason): from_json with map<string,int> NULLs the ENTIRE map when
    any one value is non-integral (dropping all that event's rows) while
    the oracle's direct int cast rounds — per-value floor-of-double is
    engine-identical and degrades one value, not the whole event."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.from_json("props", "map<string,string>")
    return ev.select("event_id", F.explode(m).alias("key", "__v")).select(
        "event_id",
        "key",
        F.floor(F.col("__v").try_cast("double")).cast("int").alias("value"),
    )


_CASE_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 1000 THEN 'low'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'high' END AS balance_band,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked
FROM customer
"""


@query("scalar_conditional_expressions", _CASE_ORACLE)
def scalar_conditional_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
    )
