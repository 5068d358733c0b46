"""Invariant tests for batch 57 (nearest join, best split, kappa)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

from pyspark.sql import functions as F
from etl_framework_spark.catalog import table


def test_nearest_value_join_is_argmin(spark):
    rows = ent.queries()["join_nearest_value"](spark, SF_SMALL).collect()
    assert rows
    cu = table(spark, SF_SMALL, "customer")
    su = {
        (r.s_nationkey, r.s_suppkey): r.s_acctbal
        for r in table(spark, SF_SMALL, "supplier").collect()
    }
    # one output row per customer whose nation has suppliers
    nations_with_supp = {nk for nk, _ in su}
    expected = cu.filter(F.col("c_nationkey").isin(*nations_with_supp)).count()
    assert len(rows) == expected
    # spot-check argmin on a handful of rows against brute force
    for r in rows[:20]:
        cands = [b for (nk, _), b in su.items() if nk == r.c_nationkey]
        best = min(abs(b - r.c_acctbal) for b in cands)
        assert abs(r.bal_gap - round(best, 2)) <= 0.011  # rounding slack


def test_best_split_flags_unique_min(spark):
    rows = ent.queries()["feat_best_split"](spark, SF_SMALL).collect()
    assert len(rows) == 9
    best = [r for r in rows if r.is_best]
    assert best
    mn = min(r.weighted_gini for r in rows)
    for r in best:
        assert r.weighted_gini == mn
    for r in rows:
        assert 0.0 <= r.weighted_gini <= 0.5  # binary Gini bound
        assert r.n_left + r.n_right == rows[0].n_left + rows[0].n_right


def test_kappa_bounds_and_confusion_totals(spark):
    r = ent.queries()["stats_cohens_kappa"](spark, SF_SMALL).collect()[0]
    assert r.n == r.n11 + r.n10 + r.n01 + r.n00
    assert 0.0 <= r.p_observed <= 1.0
    assert 0.0 < r.p_expected < 1.0
    assert -1.0 <= r.kappa <= 1.0
