"""Invariant tests for batch 128 (funnel AB, range splits, tiers)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_funnel_ab(spark):
    rows = ent.queries()["events_funnel_ab"](spark, SF_SMALL).collect()
    assert len(rows) == 2
    for r in rows:
        # strict funnel: each step loses users
        assert 1.0 >= r.rate_view >= r.rate_view_then_click >= r.rate_full_funnel >= 0.0
        assert r.n_users > 0
        # A/A split: z is noise when defined
        if r.funnel_z is not None:
            assert abs(r.funnel_z) < 5.0


def test_range_splits_balance(spark):
    rows = ent.queries()["shard_range_splits"](spark, SF_SMALL).collect()
    assert [r.shard_id for r in rows] == list(range(1, 9))
    total = sum(r.shard_rows for r in rows)
    assert total > 0
    lo, hi = min(r.shard_rows for r in rows), max(r.shard_rows for r in rows)
    # exact planning: shard sizes within 1 row of each other
    assert hi - lo <= 1
    # splits monotone; last shard unbounded
    keys = [r.upper_key for r in rows[:-1]]
    assert keys == sorted(keys)
    assert rows[-1].upper_key is None


def test_customer_tiers(spark):
    rows = ent.queries()["sales_customer_tiers"](spark, SF_SMALL).collect()
    assert [r.tier for r in rows] == list(range(10))
    shares = [r.revenue_share for r in rows]
    # tier 0 holds the biggest spenders
    assert shares == sorted(shares, reverse=True)
    assert abs(sum(shares) - 1.0) < 1e-3
