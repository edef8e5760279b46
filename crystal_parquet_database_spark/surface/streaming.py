"""Streaming-equivalent query surface over the events table.

Each entry runs the SAME builder from crystal_parquet_database_spark.streaming
on the batch events frame — windowed aggregation plans are identical in batch
and streaming (tests/test_streaming.py asserts the equivalence through a real
readStream → memory-sink run). Oracles mirror window semantics precisely:
tumbling/sliding via epoch-aligned time_bucket, session windows via
gaps-and-islands with the ``diff >= gap ⇒ new session`` rule (Spark merges
only on strict overlap), session end = last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crystal_parquet_database_spark.functions.exact import (
    DSUM_GUARDED_18_6_SQL,
    MISSING_OUTSIDE_DOMAIN_SQL,
)
from crystal_parquet_database_spark.operators.sessionize import sql_session_cte
from crystal_parquet_database_spark.streaming import windows as SW
from crystal_parquet_database_spark.surface.registry import query
from crystal_parquet_database_spark.tables import load_table

# value rides through the missing-value guard on BOTH sides: NaN/±inf/
# |v| >= 1e12 are outside the decimal(18,6) domain and count as missing
# (functions/exact.py::MISSING_OUTSIDE_DOMAIN_SQL is the one definition)
_TUMBLING_ORACLE = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {DSUM_GUARDED_18_6_SQL('value')} AS sum_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2, 3
"""


@query("stream_tumbling_window_counts", _TUMBLING_ORACLE)
def stream_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.tumbling_counts(load_table(spark, sf_dir, "events"))


_SLIDING_ORACLE = """
WITH x AS (
  SELECT ts, time_bucket(INTERVAL '5 minutes', ts) - g.i * INTERVAL '5 minutes' AS window_start
  FROM events, generate_series(0, 1) g(i)
  WHERE ts IS NOT NULL
)
SELECT window_start, window_start + INTERVAL '10 minutes' AS window_end,
       COUNT(*) AS n_events
FROM x
GROUP BY 1, 2
"""


@query("stream_sliding_window_counts", _SLIDING_ORACLE)
def stream_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.sliding_counts(load_table(spark, sf_dir, "events"))


_SESSION_ORACLE = f"""
WITH g AS {sql_session_cte(30, cols="user_id, ts", out_col="sid")}
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events
FROM g WHERE sid IS NOT NULL GROUP BY user_id, sid
"""


@query("stream_session_windows", _SESSION_ORACLE)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SW.session_windows(load_table(spark, sf_dir, "events"))


_FIRST_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  -- ORDER BY ts is NULLS LAST here (DuckDB default) and the Spark window
  -- now matches (asc_nulls_last): an event with an UNKNOWN time must not
  -- win "first event" over real-timestamped ones
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


@query("stream_first_event_per_key", _FIRST_ORACLE)
def stream_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = SW.first_event_per_key(load_table(spark, sf_dir, "events"))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


_DISTINCT_KEYS_ORACLE = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
       -- row-value distinct, NOT a string concat: '||' nulls out whenever a
       -- component is NULL, silently dropping NULL-keyed events the Spark
       -- side (dropDuplicates on raw columns) counts
       CAST(COUNT(DISTINCT (user_id, event_type)) AS BIGINT)
         AS n_distinct_keys
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@query("stream_windowed_distinct_keys", _DISTINCT_KEYS_ORACLE)
def stream_windowed_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) is illegal in streaming aggregation — the streaming
    plan is watermarked dropDuplicates on (window, key) chained into a plain
    windowed count (bounded state; see streaming/windows.py)."""
    return SW.windowed_distinct_keys(load_table(spark, sf_dir, "events"))


# same missing-value guard as the tumbling oracle — and on MAX too: the
# Spark side NULLs the whole value column, so an out-of-domain value must
# not win max here either
_RUNNING_STATS_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {DSUM_GUARDED_18_6_SQL('value')} AS total_value,
       MAX({MISSING_OUTSIDE_DOMAIN_SQL('value')}) AS max_value
FROM events
GROUP BY user_id
"""


@query("stream_running_user_stats", _RUNNING_STATS_ORACLE)
def stream_running_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom-stateful-operator surface (applyInPandasWithState): per-user
    running stats with O(keys) state on a stream; the batch replay path (run
    here) is a plain decimal-exact aggregation with identical output.
    Cross-microbatch state evolution is proven in
    tests/test_stateful_streaming.py."""
    from crystal_parquet_database_spark.streaming.stateful import running_user_stats

    return running_user_stats(load_table(spark, sf_dir, "events"))


_SSJOIN_ORACLE = """
SELECT v.event_id AS view_id,
       p.event_id AS purchase_id,
       v.user_id,
       v.ts AS view_ts,
       p.ts AS purchase_ts
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


@query("stream_view_purchase_join", _SSJOIN_ORACLE)
def stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase attribution pairs via the stream-stream self-join builder
    (streaming/joins.py): each purchase matched to every view by the same
    user within the prior hour. The streaming run (watermarks on both sides +
    the event-time bound in the join condition → bounded state) is asserted
    equal to this batch form in tests/test_streaming.py."""
    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    return view_purchase_pairs(load_table(spark, sf_dir, "events"))


_SSJOIN_LEFT_ORACLE = """
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       v.user_id, v.ts AS view_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


@query("stream_view_purchase_left_join", _SSJOIN_LEFT_ORACLE)
def stream_view_purchase_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER purchase attribution: every view, converted or not — the
    unconverted-views stream a funnel monitor feeds on. In streaming this is
    the hardest state-management shape (outer emission must wait for the
    watermark to rule out a future match; state stays bounded by
    horizon + watermark); as a batch backfill it is this plain time-range
    left join. Streaming⇄batch equality — including the watermark-flush
    semantics — is asserted with a sentinel event in
    tests/test_streaming.py."""
    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    return view_purchase_pairs(load_table(spark, sf_dir, "events"), how="left_outer")


_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type, e.ts, c.c_name, c.c_nationkey
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


@query("stream_enrich_static_join", _ENRICH_ORACLE)
def stream_enrich_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (streaming/joins.py): events joined
    map-side to the broadcast customer dimension — stateless in streaming
    (no watermark needed), identical as a batch backfill. The readStream
    equivalence is asserted in tests/test_streaming.py."""
    from crystal_parquet_database_spark.streaming.joins import enrich_with_customer

    return enrich_with_customer(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


_SSJOIN_FULL_ORACLE = """
SELECT v.event_id AS view_id, p.event_id AS purchase_id,
       COALESCE(v.user_id, p.user_id) AS user_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'view') v
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = v.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
"""


@query("stream_view_purchase_full_join", _SSJOIN_FULL_ORACLE)
def stream_view_purchase_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER attribution — completes the stream-stream join family
    (inner / left / full): unconverted views AND unattributed purchases in
    one frame, the reconciliation feed an ads-measurement pipeline emits.
    Streaming state bounds are the same as the left join (watermark on both
    sides + event-time bound ⇒ each side's state expires at
    horizon + watermark); both outer directions must wait for the watermark
    before emitting null-padded rows. Batch form = this plain full join;
    stream⇄batch equality asserted in tests/test_streaming.py."""
    from crystal_parquet_database_spark.streaming.joins import view_purchase_pairs

    return view_purchase_pairs(load_table(spark, sf_dir, "events"), how="full_outer")


_APPROX_DISTINCT_ORACLE = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_keys,
       TRUE AS within_5pct
FROM events
WHERE ts IS NOT NULL
GROUP BY 1
"""


@query("stream_windowed_approx_distinct", _APPROX_DISTINCT_ORACLE)
def stream_windowed_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECKED sketch-on-stream query: per-window HLL distinct-user estimates
    (streaming/windows.windowed_approx_distinct — O(windows × sketch) state,
    no per-key dedup) asserted within 5% of the exact count per window; the
    oracle recomputes the exacts and pins the boolean, so a drifting sketch
    hash-mismatches. Stream⇄batch estimate identity is proven separately in
    tests/test_streaming.py (hll_sketch_agg is deterministic per multiset)."""
    ev = load_table(spark, sf_dir, "events")
    est = SW.windowed_approx_distinct(ev)
    exact = (
        ev.select(F.window("ts", "5 minutes").alias("w"), "user_id")
        .dropDuplicates(["w", "user_id"])
        .groupBy(F.col("w.start").alias("window_start"))
        # count(user_id), not count(*): dropDuplicates keeps one NULL-key row
        # per window, but COUNT(DISTINCT user_id) — the oracle — and
        # hll_sketch_agg both ignore NULL keys; count(*) would be off by one
        # on any window containing a NULL user_id
        .agg(F.count("user_id").cast("bigint").alias("exact_keys"))
    )
    return est.join(exact, "window_start").select(
        "window_start",
        "exact_keys",
        # exact_keys == 0 (a window whose events all carry NULL user_id)
        # must not divide: under ANSI (the bare driver session's default)
        # x/0 is a hard SparkArithmeticException that would abort the whole
        # query over one degenerate window. A zero-key window is "within
        # 5%" iff the sketch also says zero — which HLL over zero added
        # keys always does, so the oracle's pinned TRUE still matches.
        F.when(
            F.col("exact_keys") > 0,
            F.abs(F.col("approx_keys").cast("double") - F.col("exact_keys").cast("double"))
            / F.col("exact_keys").cast("double")
            <= F.lit(0.05),
        )
        .otherwise(F.col("approx_keys") == F.lit(0))
        .alias("within_5pct"),
    )
