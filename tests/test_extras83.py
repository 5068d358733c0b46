"""Invariant tests for batch 83 (dead stock, funnel latency, brand beta)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_dead_stock_accounting(spark):
    r = ent.queries()["orders_dead_stock"](spark, SF_SMALL).collect()[0]
    assert 0 <= r.n_dead <= r.n_parts
    assert abs(r.dead_share - r.n_dead / r.n_parts) < 1e-4
    if r.n_dead > 0:
        assert r.max_stale_days > 180
        assert r.dead_lifetime_rev > 0


def test_funnel_latency_bounds(spark):
    rows = {r.stage: r for r in ent.queries()["events_funnel_latency"](spark, SF_SMALL).collect()}
    assert set(rows) <= {"view_to_click", "click_to_purchase"}
    for r in rows.values():
        assert r.n_hops > 0
        assert 0 < r.median_s <= r.p90_s
        assert r.p90_s <= 7 * 86400  # bounded by the lookback window


def test_brand_beta_averages_to_activity_share(spark):
    rows = ent.queries()["sales_brand_beta"](spark, SF_SMALL).collect()
    assert len(rows) == 25
    # components' covariances with their own sum add to var(market),
    # so betas sum to ~1 (approximate: brands miss a few days)
    assert 0.2 < sum(r.beta for r in rows) < 3.0
    for r in rows:
        assert 0.0 <= r.r2_systematic <= 1.0 + 1e-9
        assert r.n_days > 100
