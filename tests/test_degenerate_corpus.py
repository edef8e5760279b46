"""The degenerate-input gate (fast subset of scripts/degenerate_sweep.py):
empty/whitespace/punctuation-only documents, ''-valued group keys, and
zero-norm / zero-length / overflow-magnitude embeddings — the PRESENT-but-
degenerate class the NULL corpus (absent values) never exercises. The
round-10 sweep caught two real divergences here: hive layout silently
reading an empty-string partition value back as NULL (now refused loudly by
PqDB; the gate query demonstrates the NULLIF pattern), and element_at
ANSI-aborting on a zero-length embedding while the oracle returned NULL
(now F.get). This subset keeps both classes dead under pytest; the
exhaustive 149-query form is scripts/degenerate_sweep.py.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from crystal_parquet_database_spark.testing import compare_query


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    # ONE builder definition — the sweep's own (drift between the pytest
    # corpus and the sweep corpus would let the classes diverge silently)
    from degenerate_sweep import build_degenerate_corpus

    dst = str(tmp_path_factory.mktemp("degenerate_sf"))
    build_degenerate_corpus(dst)
    return dst


@pytest.mark.parametrize(
    "name",
    [
        "pqdb_normalize_compaction",   # hive ''-partition-value round-trip
        "scalar_array_functions",      # zero-length embedding: F.get not element_at
        "text_token_counts",           # split('') is [''] (one empty token) both sides
        "text_quality_scores",         # length/ratio denominators on empty text
        "text_bm25_topk",              # avgdl over zero-signal docs
        "text_repetition_features",    # one token repeated 400x
        "sample_token_budget_mixture", # ''-valued group keys are a real group
        "sim_cosine_topk_bruteforce",  # zero-norm / NaN-cos / denormal vectors
        "events_path_regex_match",     # '' event_type contributes '' to the path
    ],
)
def test_degenerate_corpus_query_parity(spark, degenerate_sf_dir, name):
    ok, msg = compare_query(spark, name, degenerate_sf_dir)
    assert ok, msg
