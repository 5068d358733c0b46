"""Invariant tests for batch 132 (stickiness, priority, delta SE)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_price_stickiness(spark):
    r = ent.queries()["sales_price_stickiness"](spark, SF_SMALL).collect()[0]
    assert r.n_transitions > 0
    assert 0 <= r.unchanged <= r.n_transitions
    assert 0.0 <= r.stickiness <= 1.0
    if r.unchanged < r.n_transitions:
        assert r.mean_abs_change_when_moved > 0


def test_priority_effectiveness_null(spark):
    rows = ent.queries()["orders_priority_effectiveness"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    slope = rows[0].lag_slope_per_level
    assert all(r.lag_slope_per_level == slope for r in rows)
    # slope magnitude is bounded by the spread of the level means
    lags = [r.mean_ship_lag_d for r in rows]
    assert abs(slope) <= (max(lags) - min(lags)) + 1e-6
    assert all(lag > 0 for lag in lags)


def test_delta_method_ratio(spark):
    r = ent.queries()["stats_delta_method_ratio"](spark, SF_SMALL).collect()[0]
    assert r.n_customers > 0
    assert r.revenue_per_order > 0
    assert r.delta_se > 0 and r.naive_se > 0
    assert r.se_ratio_delta_vs_naive > 0
    # positive rev-count covariance usually shrinks the delta SE
    assert 0.2 < r.se_ratio_delta_vs_naive < 5.0
