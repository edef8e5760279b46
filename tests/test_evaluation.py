"""binary_classifier_eval: exact tie-corrected rank-sum AUC + deterministic
precision@k, hand-checked on tiny corpora (the AUC numerator is a doubled
bigint — see operators/evaluation.py's exactness contract)."""

import pytest


def _eval(spark, rows, k=3):
    from crystal_parquet_database_spark.operators.evaluation import (
        binary_classifier_eval,
    )

    df = spark.createDataFrame(rows, "id long, s double, y int")
    return binary_classifier_eval(df, "s", "y", "id", k=k).collect()[0]


def test_auc_perfect_separation(spark):
    rows = [(1, 0.9, 1), (2, 0.8, 1), (3, 0.2, 0), (4, 0.1, 0)]
    r = _eval(spark, rows, k=2)
    assert r["auc"] == 1.0
    assert (r["n_scored"], r["n_pos"], r["n_neg"]) == (4, 2, 2)
    assert r["hits_at_k"] == 2 and r["precision_at_k"] == 1.0


def test_auc_reversed_scorer_is_zero(spark):
    rows = [(1, 0.1, 1), (2, 0.2, 1), (3, 0.8, 0), (4, 0.9, 0)]
    r = _eval(spark, rows, k=2)
    assert r["auc"] == 0.0 and r["precision_at_k"] == 0.0


def test_auc_ties_contribute_half(spark):
    # one pos and one neg share a score: pos .9 beats both negs (2), the
    # .5/.5 pair ties (0.5), pos .5 beats neg .1 (1) -> U = 3.5 over
    # n_pos*n_neg = 4
    rows = [(1, 0.9, 1), (2, 0.5, 1), (3, 0.5, 0), (4, 0.1, 0)]
    r = _eval(spark, rows, k=2)
    assert r["auc"] == pytest.approx(3.5 / 4.0, abs=0)


def test_null_scores_and_labels_excluded(spark):
    rows = [(1, 0.9, 1), (2, None, 1), (3, 0.2, None), (4, 0.1, 0)]
    r = _eval(spark, rows, k=10)
    assert r["n_scored"] == 2 and r["n_pos"] == 1 and r["n_neg"] == 1
    assert r["auc"] == 1.0
    # k_eff is min(k, n_scored): denominator 2, one positive in the top
    assert r["precision_at_k"] == 0.5


def test_single_class_auc_null_not_error(spark):
    r = _eval(spark, [(1, 0.9, 1), (2, 0.1, 1)], k=1)
    assert r["auc"] is None and r["n_neg"] == 0
    assert r["precision_at_k"] == 1.0


def test_empty_input_well_typed_row(spark):
    from crystal_parquet_database_spark.operators.evaluation import (
        binary_classifier_eval,
    )

    df = spark.createDataFrame([], "id long, s double, y int")
    r = binary_classifier_eval(df, "s", "y", "id", k=5).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_scored"], row["n_pos"], row["n_neg"]) == (0, 0, 0)
    assert row["auc"] is None and row["hits_at_k"] == 0
    assert row["precision_at_k"] is None


def test_precision_tiebreak_is_deterministic(spark):
    # three rows tie at the cut score; id ASC decides which enter the top-2
    rows = [(1, 0.5, 0), (2, 0.5, 1), (3, 0.5, 1)]
    r = _eval(spark, rows, k=2)
    # top-2 by (s desc, id asc) = ids 1, 2 -> exactly one positive
    assert r["hits_at_k"] == 1 and r["precision_at_k"] == 0.5


def test_matches_sklearn_style_reference(spark):
    # cross-check the rank-sum form against a brute-force pair count on a
    # 40-row pseudo-random corpus (deterministic LCG — no RNG in tests)
    rows = []
    for i in range(40):
        s = ((1103515245 * i + 12345) % 1000) / 1000.0
        y = 1 if (i * 7) % 3 == 0 else 0
        rows.append((i, s, y))
    pos = [s for _, s, y in rows if y == 1]
    neg = [s for _, s, y in rows if y == 0]
    won = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    expect = won / (len(pos) * len(neg))
    r = _eval(spark, rows, k=10)
    assert r["auc"] == pytest.approx(expect, abs=1e-12)


def test_calibration_bins_partition_rows_deterministically(spark):
    from crystal_parquet_database_spark.operators.evaluation import (
        binary_classifier_calibration,
    )

    # 20 rows, scores 0..19 scaled, positives are the top half
    rows = [(i, i / 20.0, 1 if i >= 10 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = binary_classifier_calibration(df, "s", "y", "id", bins=10).collect()
    assert [r["bin"] for r in out] == list(range(10))
    assert all(r["n"] == 2 for r in out)
    # bottom 5 bins all-negative, top 5 all-positive
    assert [r["pos_rate"] for r in out] == [0.0] * 5 + [1.0] * 5
    assert out[0]["min_score"] == 0.0 and out[9]["max_score"] == 19 / 20.0
    # repartitioned input -> identical table (rank is a total order)
    again = binary_classifier_calibration(
        df.repartition(7), "s", "y", "id", bins=10
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_calibration_tie_group_split_is_stable(spark):
    """All rows share one score: bins are decided purely by the id
    tiebreak — deterministic, and every bin still holds n/bins rows."""
    from crystal_parquet_database_spark.operators.evaluation import (
        binary_classifier_calibration,
    )

    rows = [(i, 0.5, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = binary_classifier_calibration(df, "s", "y", "id", bins=5).collect()
    assert [r["n"] for r in out] == [2] * 5
    # ids 0..9 in order, two per bin -> each bin has exactly one positive
    assert all(r["n_pos"] == 1 for r in out)


def test_calibration_empty_and_null_exclusion(spark):
    from crystal_parquet_database_spark.operators.evaluation import (
        binary_classifier_calibration,
    )

    empty = spark.createDataFrame([], "id long, s double, y int")
    assert binary_classifier_calibration(empty, "s", "y", "id").collect() == []
    df = spark.createDataFrame(
        [(1, None, 1), (2, 0.3, None), (3, 0.7, 1)],
        "id long, s double, y int",
    )
    out = binary_classifier_calibration(df, "s", "y", "id", bins=2).collect()
    assert sum(r["n"] for r in out) == 1  # only the fully-populated row
