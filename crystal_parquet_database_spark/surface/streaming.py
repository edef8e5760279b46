"""Streaming-equivalent query surface over the events table.

Each entry is the batch expression of a Structured Streaming recipe in
crystal_parquet_database_spark/streaming/ (windowed aggs are identical logical
plans in batch and streaming; the streaming tests assert that equivalence).
"""

from __future__ import annotations
