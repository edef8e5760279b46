"""Extended-relational surface checks that go beyond the oracle compare —
quality claims the SQL parity harness can't express (e.g. the HLL estimate
actually landing inside its asserted error bound)."""

from __future__ import annotations

from crystal_parquet_database_spark.surface import QUERIES


def test_hll_error_bound_query_all_within(spark, sf_dir):
    rows = QUERIES["agg_hll_error_bound"](spark, sf_dir).collect()
    flags = {r["l_returnflag"] for r in rows}
    assert "ALL" in flags and len(rows) >= 2
    assert all(r["within_5pct"] for r in rows)
    assert all(r["exact_orders"] > 0 for r in rows)
