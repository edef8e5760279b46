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
    sessions 1..n per user (microsecond-exact — see module docstring).

    NULL timestamps (engine-identical by construction): a NULL-ts event
    cannot be placed in time, so it gets a NULL session number and opens no
    session. Ordering is explicitly NULLS LAST to match DuckDB's ASC
    default — Spark's plain ascending is NULLS FIRST, which put NULL rows
    at the HEAD of the user's window and shifted every real row's lag (a
    silent cross-engine session-numbering divergence)."""
    w = W.partitionBy(user_col).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(tiebreak_col).asc_nulls_last()
    )
    # unix_micros takes TIMESTAMP only; NTZ columns reinterpret in the
    # (UTC-pinned) session zone first — same instant, no shift. Mirrors
    # skew.zorder_key's handling so the NTZ contract is uniform.
    ts_src: Column = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts_src = ts_src.cast("timestamp")
    ts_us: Column = F.unix_micros(ts_src)
    gap = ts_us - F.lag(ts_us).over(w)
    # NULL-ts rows sort LAST, so no real row's lag ever sees one; their own
    # flag is pinned 0 (not gap-NULL→1 — that arm is for each user's FIRST
    # real event) and their session number is masked to NULL below.
    new_s = F.when(ts_us.isNull(), 0).when(
        gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    seq = F.sum(new_s).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return df.withColumn(out_col, F.when(ts_us.isNotNull(), seq))


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

    The inner query projects ``cols`` (plus the window keys), so any events
    column a caller requests is available — it used to hardcode four
    columns, making every other ``cols`` request a binder error. The window
    keys themselves (user_id, ts, event_id tiebreak) are fixed: the Spark
    side's user_col/ts_col/tiebreak_col parameters have NO mirror here, so
    a caller customizing those on the Spark side must not verify against
    this CTE. NULL-ts parity with with_session_seq: DuckDB's ASC default is
    already NULLS LAST; new_s pins NULL-ts rows to 0 ahead of the
    LAG-IS-NULL arm (a trailing NULL-ts row would otherwise see LAG(ts)
    NULL via its NULL-ts predecessor and open a phantom session), and the
    outer CASE masks their session number to NULL."""
    keys = ["user_id", "ts", "event_id"]
    requested = [c.strip() for c in cols.split(",") if c.strip()]
    inner_cols = ", ".join(keys + [c for c in requested if c not in keys])
    return f"""(
  SELECT {cols},
         CASE WHEN ts IS NULL THEN NULL ELSE
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) END AS {out_col}
  FROM (
    SELECT {inner_cols},
           CASE WHEN ts IS NULL THEN 0
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        >= INTERVAL '{gap_minutes} minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events)
)"""
