"""Custom stateful streaming operators via applyInPandasWithState.

These are the operators windowed aggregation can't express: arbitrary
per-key state evolved across micro-batches. State lives in the state store
(bounded, checkpointed, per-key) — the 100 TB/day design constraint is that
state size is O(keys), never O(events)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crystal_parquet_database_spark.functions.exact import VALUE_DOMAIN_18_6

RUNNING_STATS_OUTPUT = "user_id long, n_events long, total_value double, max_value double"
_RUNNING_STATS_STATE = "n long, total double, mx double"


def _running_stats_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # State sentinels are None until a non-null value arrives — SQL aggregate
    # semantics (sum/max over all-NULL = NULL), matching the batch replay
    # path. A -inf/0.0 seed would leak sentinels for a key whose values are
    # all null (pandas max() over all-null is NaN; max(-inf, NaN) keeps -inf,
    # and skipna sum yields 0.0 — neither is what F.max/F.sum produce).
    n, total, mx = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        # in-domain-only, not just dropna: ±inf, NaN AND huge-finite values
        # outside the decimal(18,6) domain all join NULL in the missing
        # class so the batch replay (which NULLs them before its
        # decimal-routed sum — the ANSI cast aborts on any of them) stays
        # value-identical to the streaming path on ANY input. The bound is
        # THE shared constant, not a literal — drifting from the batch
        # side's missing_outside_domain would silently break the
        # stream/batch value-identity test_stateful_streaming.py pins.
        fv = pdf["value"].astype(float)
        vals = pdf["value"][np.isfinite(fv) & (np.abs(fv) < VALUE_DOMAIN_18_6)]
        if len(vals):
            total = float(vals.sum()) + (total if total is not None else 0.0)
            m = float(vals.max())
            mx = m if mx is None else max(mx, m)
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) maintained across micro-batches.

    On a stream: incremental per-key state, one output row per key per batch
    (update mode). On a batch frame: falls back to a plain aggregation with
    identical output — the replay path.

    NaN contract: a NaN ``value`` is treated as MISSING (like NULL) in both
    paths. The streaming path cannot do otherwise — Arrow hands the pandas
    UDF NULL and NaN as the same float NaN, so pandas ``dropna`` removes
    both — and SQL's NaN propagation (sum→NaN, max→NaN-as-greatest) would
    therefore silently diverge between the paths. The batch replay maps
    NaN→NULL before aggregating so the declared equivalence holds on ANY
    input, not just NaN-free fixtures.
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        from crystal_parquet_database_spark.functions.exact import dsum_of_double

        # decimal-routed sum: exact, order-independent, SQL-oracle-checkable
        # (the streaming path accumulates in float — equality within fp noise
        # is pinned in tests/test_stateful_streaming.py)
        # ±inf and |v| >= 1e12 join NaN in the missing class: ANSI
        # cast-to-decimal(18,6) is out-of-range for all of them and would
        # abort the batch replay on one bad value (functions/exact.py
        # documents the domain)
        from crystal_parquet_database_spark.functions.exact import (
            missing_outside_domain,
        )

        v = missing_outside_domain("value")
        return events.withColumn("value", v).groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            dsum_of_double("value", "decimal(18,6)").alias("total_value"),
            F.max("value").alias("max_value"),
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=_RUNNING_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
