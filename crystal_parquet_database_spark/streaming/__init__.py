"""Structured Streaming recipes over event tables."""

from pyspark.sql import DataFrame as _DataFrame


def with_watermark(df: _DataFrame, ts_col: str, delay: str | None) -> _DataFrame:
    """Apply a watermark only where one applies: batch replays of a streaming
    recipe skip it (batch frames reject withWatermark-dependent semantics
    anyway), and ``delay=None`` means unbounded state by explicit choice.
    The single definition both joins.py and windows.py build on."""
    if df.isStreaming and delay is not None:
        return df.withWatermark(ts_col, delay)
    return df
