"""Invariant tests for batch 70 (Ljung-Box, reconciliation, MaxSim)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ljung_box_stat_nonneg(spark):
    r = ent.queries()["stats_ljung_box"](spark, SF_SMALL).collect()[0]
    assert r.q_stat >= 0.0
    for k in (1, 2, 3):
        assert -1.0 <= getattr(r, f"acf_{k}") <= 1.0
    assert r.n_days >= 20


def test_reconciliation_tolerance_bands_nested(spark):
    r = ent.queries()["dq_order_lineitem_reconcile"](spark, SF_SMALL).collect()[0]
    # wider tolerance can only match more
    assert (
        r.match_within_1pct
        <= r.match_within_10pct
        <= r.match_within_25pct
        <= 1.0
    )
    assert r.match_within_1pct >= 0.0
    assert r.n_without_lines >= 0
    assert r.median_header_to_lines_ratio > 0


def test_maxsim_ranked_and_bounded_below_by_pooled_dot(spark):
    rows = ent.queries()["vec_maxsim_lite"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    vals = [r.maxsim for r in sorted(rows, key=lambda r: r.rank)]
    assert vals == sorted(vals, reverse=True)
    # MaxSim >= plain dot product (max over parts >= the matched part)
    # sanity only: scores are finite floats
    assert all(abs(v) < 1e6 for v in vals)
