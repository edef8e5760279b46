"""Empty-corpus gate: the fast subset of scripts/empty_sweep.py — the eight
queries the round-8 sweep caught crashing or diverging on zero-row input
(IndexError on pinned codebooks, zero-arm expression trees, ANSI
divide-by-zero in sketch bounds, Spark-vs-ANSI grand-total rollup rows,
and a PqDB gate query whose empty create() left no dataset)."""

from __future__ import annotations

import os
import tempfile

import pyarrow.parquet as pq
import pytest

from crystal_parquet_database_spark.testing import compare_query

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("empty_sf"))
    for f in os.listdir(SRC):
        t = pq.read_table(os.path.join(SRC, f))
        pq.write_table(t.slice(0, 0), os.path.join(dst, f))
    return dst


@pytest.mark.parametrize(
    "name",
    [
        "agg_cube_lineitem",            # grand-total row: Spark none, ANSI one
        "agg_rollup_order_stats",       # (HAVING COUNT(*) > 0 pins parity)
        "agg_grouping_sets_explicit",
        "agg_approx_count_distinct",    # exact=0 must not ANSI-divide
        "agg_hll_error_bound",
        "pqdb_normalize_compaction",    # empty create() still creates the dataset
        "sim_ivf_recall_at_k",          # empty pinned codebook -> exact fallback
        "sim_pq_recall_at_k",           # empty seed slice -> empty result, not IndexError
    ],
)
def test_empty_corpus_matches_oracle(spark, empty_sf_dir, name):
    ok, msg = compare_query(spark, name, empty_sf_dir)
    assert ok, msg
