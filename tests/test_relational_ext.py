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


def test_kll_quantile_bound_query_stable_across_partitionings(spark, sf_dir):
    """The KLL sketch itself is randomized, but the emitted columns must be
    deterministic: exact counts plus a rank-band boolean that holds at any
    partitioning (the sketch's rank error is ~1.65% vs the ±5% band)."""
    rows1 = QUERIES["agg_kll_quantile_bound"](spark, sf_dir).collect()
    assert len(rows1) == 3
    assert all(r["median_rank_within_5pct"] for r in rows1)
    assert all(r["n_rows"] > 0 for r in rows1)
    rows2 = QUERIES["agg_kll_quantile_bound"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_cms_invariants(spark, sf_dir):
    """CMS one-sided error: every estimate >= exact, and within the eps=2/w
    bound on this corpus (both asserted as data, not just schema)."""
    from crystal_parquet_database_spark.surface import QUERIES

    rows = QUERIES["agg_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r["is_overestimate"] for r in rows)
    assert all(r["within_eps"] for r in rows)
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
