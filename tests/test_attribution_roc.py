"""Invariant tests for batch 81 (attribution models, ROC Youden)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_attribution_models_credit_same_purchases(spark):
    rows = ent.queries()["events_attribution_compare"](spark, SF_SMALL).collect()
    assert rows
    # both models credit exactly one touch per attributed purchase,
    # so the totals across touch types agree
    assert sum(r.n_first_credits for r in rows) == sum(
        r.n_last_credits for r in rows
    )
    for r in rows:
        assert r.touch_type in ("view", "click")
        assert r.first_minus_last == r.n_first_credits - r.n_last_credits


def test_position_credit_conserves_mass(spark):
    rows = ent.queries()["events_attribution_position"](spark, SF_SMALL).collect()
    assert rows
    total_credit = sum(r.position_credit for r in rows)
    # total credit == number of attributed purchases (each spreads 1.0)
    assert total_credit > 0
    assert abs(total_credit - round(total_credit)) < 0.01
    for r in rows:
        assert r.position_credit > 0
        assert r.n_touch_instances >= r.position_credit - 1e-6


def test_youden_flags_max_j(spark):
    rows = ent.queries()["stats_roc_youden"](spark, SF_SMALL).collect()
    assert len(rows) == 9
    best = max(r.youden_j for r in rows)
    for r in rows:
        assert 0.0 <= r.tpr <= 1.0 and 0.0 <= r.fpr <= 1.0
        assert abs(r.youden_j - (r.tpr - r.fpr)) < 1e-4
        assert r.is_optimal == (r.youden_j == best)
    assert any(r.is_optimal for r in rows)
