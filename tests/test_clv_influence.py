"""Invariant tests for batch 87 (NPV, Cook's D, peak shaving)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_npv_discounts_strictly(spark):
    rows = ent.queries()["sales_customer_npv"](spark, SF_SMALL).collect()
    assert rows
    npvs = [r.npv for r in rows]
    assert npvs == sorted(npvs, reverse=True)
    for r in rows:
        # discounting can only shrink (first order is undiscounted)
        assert r.npv <= r.raw_total + 0.01
        assert 0.0 < r.discount_factor_effective <= 1.0
        assert r.n_orders >= 1


def test_cooks_distance_positive_and_ranked(spark):
    rows = ent.queries()["stats_cooks_distance"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    ds = [r.cooks_d for r in rows]
    assert ds == sorted(ds, reverse=True)
    for r in rows:
        assert r.cooks_d > 0
        assert 0.0 < r.leverage < 1.0


def test_peak_shaving_queue_sane(spark):
    rows = ent.queries()["events_peak_shaving"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.cap_p90 > 0
        assert r.max_queue_depth >= r.final_backlog - 1e-6
        assert 0 <= r.hours_with_backlog <= r.n_hours
        # ~10% of hours exceed a p90 cap, so SOME backlog must appear
        assert r.hours_with_backlog > 0
