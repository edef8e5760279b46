"""The remaining classic TPC-H query shapes (Q8/Q9/Q11/Q13/Q20/Q21), adapted
to the fixture schema — completing all 22 shapes across the surface modules.

Adaptations (fixture lacks partsupp, l_commitdate/l_receiptdate, comments):
- Q9/Q11/Q20 use lineitem (+part.p_retailprice) as the partsupp stand-in.
- Q13's comment NOT-LIKE becomes a priority exclusion inside the join cond.
- Q21's "received late" becomes l_shipdate > o_orderdate + 60 days.

Exactness follows the surface-wide contract: decimal-exact sums, double only
at the output boundary, identical post-aggregation expression shape on the
oracle side.

Scale notes (100 TB): every dimension join is broadcast; the only fact-fact
shuffles are the groupBy on the fact's own key (Q11/Q20/Q21 pre-aggregations),
which partial-aggregate map-side before shuffling. Q21 reuses one
lineitem⋈orders build for both the candidate rows and the per-order supplier
stats, so the fact is shuffled on l_orderkey once (AQE reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crystal_parquet_database_spark.functions.exact import (
    DCAST_DOUBLE_SQL,
    DISC_PRICE_SQL,
    DSUM_DOUBLE_SQL,
    disc_price,
    dsum,
    money,
)
from crystal_parquet_database_spark.surface.registry import query
from crystal_parquet_database_spark.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# single definition in functions/exact.py, aliased for the f-string oracles
_DISC_PRICE = DISC_PRICE_SQL
_DEC0 = "CAST(0 AS DECIMAL(18,2))"

# Q8/Q9/Q11 sums are scale-4 PRODUCT decimals (disc_price, price*qty) —
# their oracles route every decimal→double cast through the VARCHAR
# round-trip (DSUM_DOUBLE_SQL / DCAST_DOUBLE_SQL) so DuckDB's direct-cast
# double-rounding above 2^53 scaled significand can never diverge from
# Spark's correctly-rounded cast at a larger fixture (functions/exact.py).

_Q8_ORACLE = f"""
SELECT o_year,
       {DSUM_DOUBLE_SQL(f"CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE {_DEC0} END")}
       / {DSUM_DOUBLE_SQL("volume")} AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
         {_DISC_PRICE} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'STANDARD'
)
GROUP BY o_year
"""


@query("q8_national_market_share", _Q8_ORACLE)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share of one supplier nation within a customer
    region, per order year — 7-way join, conditional share of an exact decimal
    sum. The six true dimensions (part, supplier, customer, both nation roles,
    region) broadcast by explicit hint; ORDERS is a second fact joined on
    l_orderkey — left declarative so AQE broadcasts it at small scale while a
    1000-executor run plans the shuffle join the data size demands."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = disc_price()
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero))
                / dsum(F.col("volume"))
            ).alias("mkt_share")
        )
    )


_Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       {DSUM_DOUBLE_SQL(
           f"{_DISC_PRICE}"
           " - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))"
       )} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(YEAR(o_orderdate) AS INTEGER)
"""


@query("q9_product_type_profit", _Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year with a LIKE filter
    on part name (p_retailprice*l_quantity stands in for the missing
    ps_supplycost). All decimal arithmetic is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = disc_price() - money("p_retailprice") * money("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount")).alias("sum_profit"))
    )


_Q11_ORACLE = f"""
WITH supp_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
           AS pv_dec
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, {DCAST_DOUBLE_SQL("pv_dec")} AS part_value
FROM supp_part
WHERE {DCAST_DOUBLE_SQL("pv_dec")}
      > (SELECT {DSUM_DOUBLE_SQL("pv_dec")} / CAST(COUNT(*) AS DOUBLE) * 2.0
         FROM supp_part)
"""


@query("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value within one nation's suppliers, kept if
    above a threshold derived from the whole relation — group-then-
    scalar-subquery over the SAME aggregate (computed once, broadcast as a
    1-row DF; no second fact scan). (extendedprice*quantity stands in for
    supplycost*availqty.)

    Threshold: 2× the MEAN per-part value — deliberately scale-FREE where
    the spec's fixed fraction is scale-DEPENDENT (TPC-H sets it to
    0.0001/SF precisely because total value grows with the corpus while
    per-part values don't: a fixed fraction of the total empties the result
    as SF grows — measured here: a 0.001 fraction returned 385 parts at
    sf0.01 and ZERO at sf0.1, so every larger-scale probe was comparing
    empty frames and verified nothing). A multiple-of-mean cut selects a
    stable above-average fraction of parts at every scale.

    The threshold is derived from the exact DECIMAL per-part sums (summed
    exactly, cast to double once, then ÷count ×2.0 in identical IEEE ops
    both sides) — summing the per-part doubles instead would be
    partition-order dependent and could flip membership of a part within
    ~1 ulp of the cut."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    value = money("l_extendedprice") * money("l_quantity")
    per_part = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(value).alias("pv_dec"))
    )
    # Threshold over the already-reduced per-part relation (tiny), summed in
    # exact decimal, mirroring the oracle's scalar subquery expression shape
    # (sum→double, ÷count, ×2.0 — same op order, identical IEEE results).
    total = per_part.agg(
        (
            F.sum(F.col("pv_dec")).cast("double")
            / F.count(F.lit(1)).cast("double")
            * F.lit(2.0)
        ).alias("__cut")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("pv_dec").cast("double") > F.col("__cut"))
        .select("p_partkey", F.col("pv_dec").cast("double").alias("part_value"))
    )


_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@query("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT join with an
    extra predicate INSIDE the join condition (so unmatched customers still
    count as 0), then a second aggregation over the first. (Priority
    exclusion stands in for the comment NOT-LIKE.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW")
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY l_partkey, l_suppkey
    HAVING CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                          AND l_shipdate < TIMESTAMP '1998-01-01'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          > 0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
  )
"""


@query("q20_potential_promotion", _Q20_ORACLE)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries decorrelated to a grouped HAVING
    + left-semi join — suppliers in one nation who shipped more than half of a
    small-part's volume inside one year. (Year-window share of shipped
    quantity stands in for availqty > 0.5*sum(qty).)"""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qty = money("l_quantity")
    zero = F.lit(0).cast("decimal(18,2)")
    in_year = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    heavy_pairs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            dsum(F.when(in_year, qty).otherwise(zero)).alias("year_qty"),
            dsum(qty).alias("total_qty"),
        )
        .filter(F.col("year_qty") > F.lit(0.5) * F.col("total_qty"))
        # distinct BEFORE broadcast: the post-HAVING relation is bounded by
        # #(part,supplier) pairs — fact-proportional (10,962 rows vs 1,000
        # suppliers at sf0.1), so broadcasting it as-is would ship a
        # fact-scaled table at 100 TB. The projected-and-distinct supplier
        # key set IS bounded by |supplier|; the semi join is unaffected.
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = _t(spark, sf_dir, "supplier")
    # heavy_pairs is now a distinct supplier-key set, bounded by |supplier| —
    # broadcast it so the semi probe needs no supplier-side shuffle.
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(heavy_pairs), s.s_suppkey == heavy_pairs.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("q21_suppliers_kept_waiting", _Q21_ORACLE)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on a multi-supplier order —
    EXISTS + correlated NOT EXISTS, decorrelated to per-order supplier stats.
    The two distinct counts are computed as a TWO-LEVEL aggregation
    ((orderkey, suppkey) partial → orderkey) instead of countDistinct×2,
    which would plan an Expand that triples the fact's rows before the
    shuffle. ("Late" = shipped >60 days after the order date, standing in
    for l_receiptdate > l_commitdate.)"""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late_supp"),
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = _t(spark, sf_dir, "supplier")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        lo.filter(F.col("late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )
