"""Invariant tests for batch 73 (PR curve, Mahalanobis OOD, BM25 sweep)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_pr_curve_monotone_tradeoffs(spark):
    rows = sorted(
        ent.queries()["stats_pr_curve"](spark, SF_SMALL).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) == 5
    for a, b in zip(rows, rows[1:]):
        # raising the threshold can only lower recall
        assert b.recall_ <= a.recall_ + 1e-9
        assert b.tp <= a.tp
    for r in rows:
        assert 0.0 <= r.precision_ <= 1.0
        assert 0.0 <= r.recall_ <= 1.0
        if r.precision_ + r.recall_ > 0:
            expect_f1 = (
                2 * r.precision_ * r.recall_ / (r.precision_ + r.recall_)
            )
            assert abs(r.f1 - expect_f1) < 1e-3


def test_ood_scores_ranked(spark):
    rows = sorted(
        ent.queries()["vec_ood_mahalanobis"](spark, SF_SMALL).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert a.ood_score >= b.ood_score
    for r in rows:
        # a standardized per-dim z RMS near/above 1 marks the tail
        assert r.ood_score > 0.5


def test_bm25_sweep_overlap_bounds(spark):
    rows = ent.queries()["llm_bm25_param_sweep"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.k1_low < r.k1_high
        assert 0 <= r.top10_overlap <= 10
    # nearby k1 settings should agree at least as much as distant ones
    by_pair = {(r.k1_low, r.k1_high): r.top10_overlap for r in rows}
    assert by_pair[(0.8, 1.2)] >= by_pair[(0.8, 2.0)] - 2
