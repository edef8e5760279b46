"""Gaps-and-islands sessionization — the ONE definition of the recipe three
query families consume (event-level session labels, sessionized funnels,
in-session Markov transitions). The expression is precision-critical in two
ways that per-query copies kept re-deriving by hand:

- the gap is computed in MICROSECONDS (fixture timestamps carry sub-second
  parts; a seconds cast could flip a gap within 1s of the session cut);
- the running-sum window uses the same (ts, tiebreak) ordering as the lag
  window it consumes — a mismatched tiebreak makes the session numbering
  nondeterministic for equal timestamps.

Scale shape: one user-keyed shuffle; both windows (lag + running sum) ride
it, and per-user event counts bound the window state — no corpus-wide
window anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def with_session_seq(
    df: DataFrame,
    gap_minutes: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    out_col: str = "session_seq",
) -> DataFrame:
    """Append a per-user session number: an inactivity gap >= ``gap_minutes``
    opens a new session; the running sum of the new-session flag numbers
    sessions 1..n per user (microsecond-exact — see module docstring)."""
    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # unix_micros takes TIMESTAMP only; NTZ columns reinterpret in the
    # (UTC-pinned) session zone first — same instant, no shift. Mirrors
    # skew.zorder_key's handling so the NTZ contract is uniform.
    ts_src: Column = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts_src = ts_src.cast("timestamp")
    ts_us: Column = F.unix_micros(ts_src)
    gap = ts_us - F.lag(ts_us).over(w)
    new_s = F.when(
        gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        out_col, F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )


def sql_session_cte(
    gap_minutes: int,
    cols: str = "user_id, event_type, ts",
    out_col: str = "session_seq",
) -> str:
    """DuckDB mirror of ``with_session_seq`` over the ``events`` table — the
    ONE definition of the SQL side, for the same reason the Spark side was
    centralized: the ``>=`` gap comparison and the ``(ts, event_id)``
    tiebreak on BOTH windows are precision-critical, and the four per-query
    hand copies this replaces could silently drift (one edited copy would
    verify a different sessionization than ``with_session_seq`` computes).

    Returns a parenthesized subquery projecting ``cols`` plus ``out_col``;
    interpolate as ``WITH sess AS {sql_session_cte(...)}`` or ``FROM {...}``.
    """
    return f"""(
  SELECT {cols},
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS {out_col}
  FROM (
    SELECT event_id, user_id, event_type, ts,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        >= INTERVAL '{gap_minutes} minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events)
)"""
