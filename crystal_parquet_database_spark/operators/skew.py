"""Skew-mitigation operators: salting for hot keys, bucketed co-located joins.

AQE's skew-join handling (on by default in session.py) splits oversized
partitions at runtime; these operators are the *explicit* forms for the cases
AQE can't fix — a single hot key inside one partition of a shuffled
aggregation, or a join you will run many times and want shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, entropy_cols: list[str] | None, n_salts: int) -> Column:
    """ONE definition of the deterministic content-hash salt (salted_join and
    salted_agg_count must never drift — the expression is correctness-
    critical): salt from a hash of the row CONTENT, never from row position
    (monotonically_increasing_id). Position is fetch-order dependent on
    post-shuffle inputs, and under a partial stage retry rows can re-salt
    differently than the copies completed reducers already consumed — the
    SPARK-23207 class of silent row loss/duplication. A hot KEY's rows still
    spread (their non-key columns differ); only rows byte-identical in EVERY
    hashed column co-locate — pass a unique id via ``entropy_cols`` when the
    frame might carry such rows."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in (entropy_cols or df.columns)]),
        F.lit(n_salts),
    )


def _check_salt_name_free(*dfs: DataFrame) -> None:
    """The salting ops own the ``__salt`` name; silently overwriting (big
    side) or duplicating (small side, via crossJoin) a caller's column of
    that name corrupts the result or fails with AMBIGUOUS_REFERENCE deep in
    the join — fail loudly at the API boundary instead."""
    for df in dfs:
        if "__salt" in df.columns:
            raise ValueError(
                "input already carries a '__salt' column (a prior salting "
                "stage not dropped?); rename or drop it before salting"
            )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    entropy_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed.

    The big side gets a deterministic salt derived from a high-cardinality
    hash of the whole row; the small side is replicated n_salts times. The
    shuffle key becomes (key, salt) — a hot key now spreads over n_salts
    reducers. Replication multiplies the small side's shuffle volume, so keep
    it dimension-sized (if it's broadcastable, broadcast instead — salting is
    for when BOTH sides are too big to broadcast but one is skewed).

    Result is identical to ``big.join(small, key, how)`` (asserted in tests)
    for join types that preserve at most the big side: inner, left,
    left_semi, left_anti. right/full outer are rejected — an unmatched small
    row would survive once per salt replica.

    The salt hashes ``entropy_cols`` (default: every column of ``big``), so
    the mitigation only spreads a hot key whose rows DIFFER in those
    columns. A frame already projected down to just the key — or carrying
    byte-identical hot-key rows — gets one salt per key and the hot key
    lands back on a single reducer. When a stable unique column exists (an
    id, an event timestamp), pass it via ``entropy_cols`` explicitly rather
    than relying on full-row entropy.
    """
    allowed = {
        "inner",
        "left",
        "leftouter",
        "left_outer",
        "left_semi",
        "leftsemi",
        "left_anti",
        "leftanti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} join types; {how!r} would "
            "duplicate unmatched small-side rows across salt replicas"
        )
    _check_salt_name_free(big, small)
    salted_big = big.withColumn("__salt", _content_salt(big, entropy_cols, n_salts))
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("long").alias("__salt"))
    salted_small = small.crossJoin(salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame, key: str, n_salts: int = 16, entropy_cols: list[str] | None = None
) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial aggregate on
    (key, salt), then final aggregate on key. Spark's hash aggregate already
    does map-side partials — explicit salting matters for aggregates without
    partial forms (e.g. exact collect/distinct per key) or extreme single-key
    skew. Shown here for count/sum shapes.

    The salt hashes ``entropy_cols`` (default: every column), so the input
    must carry columns that DISTINGUISH a hot key's rows — a frame projected
    down to the key column alone gets a constant salt per key and the whole
    hot key stays on one reducer. Pass a stable unique column (an id) via
    ``entropy_cols`` when one exists."""
    _check_salt_name_free(df)
    salted = df.withColumn("__salt", _content_salt(df, entropy_cols, n_salts))
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").cast("long").alias("n"))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 8,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations on ``key`` between co-bucketed tables need NO shuffle —
    the write pre-pays the exchange once. This is the 100 TB answer for
    fact⋈fact joins repeated across a workload.

    ``path`` makes the table external at that location (scratch-dir friendly
    for harnesses running under a bare session whose default warehouse dir
    may not be writable); the previous registration is dropped first so
    repeated runs don't collide on a stale catalog entry."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables (see ``write_bucketed``)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_dim: int = 16
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) interleave column over ``cols`` — the
    multi-dimensional data-skipping layout key (Delta/Iceberg ZORDER).

    Each column is scaled to a ``bits_per_dim``-bit integer grid between its
    global min and max (one tiny agg, broadcast as literals), then the bit
    planes are interleaved MSB-first so sorting by the key keeps rows close
    in EVERY dimension at once — a linear sort keeps only the first column
    narrow per file, leaving the others full-range (asserted side by side in
    tests/test_db.py).

    All arithmetic is built-in integer expressions inside codegen; the only
    non-map stage is the 1-row min/max aggregate. Uniform-grid scaling (not
    quantile) is the standard ZORDER choice — skew in a dimension costs
    skipping precision, not correctness, and avoids a quantile pass.

    Returns (frame-with-key, key-column-name).
    """
    # the interleave must fit a signed 64-bit long: bits_per_dim * ndims > 63
    # would push the top bit into the sign bit and make high-range rows sort
    # negative, silently breaking the clustering order — shrink to fit
    if cols and bits_per_dim * len(cols) > 63:
        bits_per_dim = 63 // len(cols)
        if bits_per_dim < 1:
            raise ValueError(f"too many z-order columns ({len(cols)}) for a 64-bit key")
    # Normalize every dimension to a double BEFORE the min/max scan so
    # date/timestamp columns (textbook ZORDER dimensions) work — float() on a
    # datetime aggregate raises TypeError.
    def as_num(c: str):
        dt = dict(df.dtypes)[c]
        col = F.col(c)
        if dt == "date":
            return F.datediff(col, F.lit("1970-01-01").cast("date")).cast("double")
        if dt.startswith("timestamp"):
            # unix_micros takes TIMESTAMP only; NTZ columns reinterpret in
            # the (UTC-pinned) session zone first — same instant, no shift
            if dt == "timestamp_ntz":
                col = col.cast("timestamp")
            return F.unix_micros(col).cast("double")
        return col.cast("double")

    nums = {c: as_num(c) for c in cols}
    # min/max over FINITE values only: Spark orders NaN above +inf, so one
    # NaN in a dimension would make mx = NaN, span = NaN (truthy — the
    # `or 1.0` degenerate guard never fires), and every row's bucket would
    # collapse to a constant — the dimension silently drops out of the
    # Z-order with no error. (NaN/±inf fail both range comparisons below.)
    def _finite(e):
        return F.when((e > float("-inf")) & (e < float("inf")), e)

    aggs = []
    for c in cols:
        aggs += [
            F.min(_finite(nums[c])).alias(f"__mn_{c}"),
            F.max(_finite(nums[c])).alias(f"__mx_{c}"),
        ]
    stats = df.agg(*aggs).first()
    nbuckets = 1 << bits_per_dim
    scaled = []
    for c in cols:
        mn_raw, mx_raw = stats[f"__mn_{c}"], stats[f"__mx_{c}"]
        if mn_raw is None or mx_raw is None:
            # empty frame or all-null column: no range to scale over — give
            # the dimension a constant 0 plane rather than raising
            scaled.append(F.lit(0).cast("bigint"))
            continue
        mn = float(mn_raw)
        mx = float(mx_raw)
        span = (mx - mn) or 1.0
        num = nums[c]
        bucket = F.floor((num - F.lit(mn)) / F.lit(span) * nbuckets).cast("bigint")
        scaled.append(
            # NULL and NaN and -inf take bucket 0, +inf the top bucket —
            # explicit, because floor(NaN)→bigint is an ANSI hazard and
            # F.least skips nulls (least(nbuckets-1, NULL) would sort every
            # null row to the far corner and pollute its row-group stats)
            F.when(
                num.isNull() | F.isnan(num) | (num == float("-inf")),
                F.lit(0).cast("bigint"),
            )
            .when(num == float("inf"), F.lit(nbuckets - 1).cast("bigint"))
            .otherwise(F.least(F.lit(nbuckets - 1).cast("bigint"), bucket))
        )
    z = F.lit(0).cast("bigint")
    for bit in range(bits_per_dim - 1, -1, -1):  # MSB first
        for s in scaled:
            z = F.shiftleft(z, 1).bitwiseOR(F.shiftright(s, bit).bitwiseAND(F.lit(1)))
    return df.withColumn("__zorder", z), "__zorder"
