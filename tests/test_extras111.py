"""Invariant tests for batch 111 (Neyman, DOW variance, discovery)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_neyman_allocations_sum(spark):
    rows = ent.queries()["mix_neyman_allocation"](spark, SF_SMALL).collect()
    assert rows
    prop = sum(r.alloc_proportional for r in rows)
    ney = sum(r.alloc_neyman for r in rows)
    # both allocations spend (about) the full budget
    assert abs(prop - 1000.0) < 1.0
    assert abs(ney - 1000.0) < 1.0
    # shifts cancel out
    assert abs(sum(r.alloc_shift for r in rows)) < 1.0
    for r in rows:
        assert r.stratum_sd > 0


def test_dow_variance_profile(spark):
    rows = ent.queries()["ts_dow_heteroscedasticity"](spark, SF_SMALL).collect()
    assert len(rows) == 7
    assert sorted(r.dow for r in rows) == [1, 2, 3, 4, 5, 6, 7]
    ratio = rows[0].max_min_var_ratio
    assert ratio >= 1.0
    for r in rows:
        assert r.n_days > 0 and r.var_qty > 0
        assert r.max_min_var_ratio == ratio


def test_discovery_curve_beta(spark):
    r = ent.queries()["events_user_discovery_curve"](spark, SF_SMALL).collect()[0]
    assert r.total_users > 0 and r.total_events >= r.total_users
    assert r.n_days > 0
    # beta in [0, 1]: 0 = closed audience (all users seen on day one),
    # 1 = pure acquisition
    assert 0.0 <= r.heaps_beta <= 1.0 + 1e-6
