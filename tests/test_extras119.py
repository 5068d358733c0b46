"""Invariant tests for batch 119 (outage gaps, effect size, HHI trend)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_outage_gaps(spark):
    r = ent.queries()["events_outage_gaps"](spark, SF_SMALL).collect()[0]
    assert r.n_gaps > 0
    assert 0 <= r.n_outages <= r.n_gaps
    assert r.worst_gap_s >= 0
    assert (r.outage_seconds > 0) == (r.n_outages > 0)
    assert 0.0 <= r.downtime_share <= 1.0


def test_effect_size_consistency(spark):
    r = ent.queries()["stats_effect_size_anova"](spark, SF_SMALL).collect()[0]
    assert r.k == 3
    assert r.ss_between >= 0 and r.ss_within > 0
    assert 0.0 <= r.eta_squared <= 1.0
    # omega is bias-corrected: never above eta
    assert r.omega_squared <= r.eta_squared + 1e-9
    # flags explain ~nothing on synthetic data
    assert r.eta_squared < 0.01
    assert r.f_stat >= 0


def test_concentration_trend(spark):
    rows = ent.queries()["sales_concentration_trend"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_customers > 0
        # HHI bounded by [1/n, 1]
        assert 1.0 / r.n_customers - 1e-9 <= r.revenue_hhi <= 1.0
        assert r.hhi_x_n >= 1.0 - 1e-6
