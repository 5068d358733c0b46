"""Invariant tests for batch 127 (slope test, lifespan, bag gap)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_slope_homogeneity_null(spark):
    r = ent.queries()["stats_slope_homogeneity"](spark, SF_SMALL).collect()[0]
    assert abs(r.slope_diff - (r.slope_returned - r.slope_kept)) < 1e-3
    # exchangeable groups -> slopes agree
    assert abs(r.slope_t) < 5.0
    assert r.df > 100


def test_customer_lifespan(spark):
    r = ent.queries()["sales_customer_lifespan"](spark, SF_SMALL).collect()[0]
    assert r.n_customers > 0
    assert 0 <= r.one_timers <= r.n_customers
    assert abs(r.one_timer_share - r.one_timers / r.n_customers) < 1e-5
    if r.one_timers < r.n_customers:
        assert 0 < r.mean_active_span_d <= r.max_span_d


def test_bag_dedup_gap(spark):
    r = ent.queries()["llm_bag_dedup_gap"](spark, SF_SMALL).collect()[0]
    assert r.n_docs > 0
    # bag fingerprint can only merge, never split
    assert r.distinct_bag <= r.distinct_exact <= r.n_docs
    assert r.reordered_dups == r.distinct_exact - r.distinct_bag
    assert 0.0 <= r.reorder_dup_share < 1.0
