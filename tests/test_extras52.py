"""Invariant tests for batch 52 (clamped cumsum, Croston, busday lag)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_clamped_cumsum_invariants(spark):
    rows = ent.queries()["ts_clamped_cumsum"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # the floor guarantees non-negative balances everywhere
        assert r.final_balance >= 0.0
        assert r.peak_balance >= r.final_balance
        assert 0 <= r.stockout_days <= r.n_days
        assert r.n_days >= 1


def test_croston_rates_consistent(spark):
    rows = ent.queries()["ts_croston"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_demands >= 2
        assert r.smoothed_size > 0.0
        # intervals are >= 1 day, so the EWMA of intervals is too
        assert r.smoothed_interval >= 1.0
        # rate = size/interval; SBA shrinks it by exactly (1 - a/2)
        assert r.croston_rate <= r.smoothed_size + 1e-6
        assert abs(r.sba_rate - r.croston_rate * 0.9) < 1e-4


def test_busday_lag_bounds(spark):
    rows = ent.queries()["orders_busday_lag"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # the synthetic generator does NOT enforce ship >= order, so
        # negative lags are legitimate — check ordering + magnitude only
        assert r.min_busdays <= r.avg_busdays <= r.max_busdays
        # business days never exceed 5/7 of the table's ~7y span
        assert abs(r.min_busdays) <= 2610 and abs(r.max_busdays) <= 2610
        assert 0.0 <= r.within_5bd <= 1.0
        assert r.n_lines > 0
