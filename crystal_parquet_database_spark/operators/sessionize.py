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
