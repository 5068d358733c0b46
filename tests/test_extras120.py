"""Invariant tests for batch 120 (damped Holt, momentum, Breslow-Day)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_holt_damped_forecasts(spark):
    r = ent.queries()["ts_holt_damped"](spark, SF_SMALL).collect()[0]
    assert r.n_months > 12
    assert r.level > 0
    # damping: h2 increment is phi * h1 increment
    inc1 = r.forecast_h1 - r.level
    inc2 = r.forecast_h2 - r.forecast_h1
    assert abs(inc2 - 0.9 * inc1) < 1e-3
    assert abs(inc1 - 0.9 * r.trend) < 1e-3


def test_brand_momentum_ranking(spark):
    rows = ent.queries()["sales_brand_momentum"](spark, SF_SMALL).collect()
    assert rows
    ms = [r.momentum for r in rows]
    assert ms == sorted(ms, reverse=True)
    for r in rows:
        assert r.prior_6m_rev > 0
        assert abs(
            r.momentum
            - (r.recent_6m_rev - r.prior_6m_rev) / r.prior_6m_rev
        ) < 1e-3


def test_breslow_day_null(spark):
    r = ent.queries()["stats_breslow_day"](spark, SF_SMALL).collect()[0]
    assert r.n_strata > 1
    assert r.df == r.n_strata - 1
    assert r.mh_common_or > 0
    assert r.breslow_day_chi2 >= 0
    # homogeneous synthetic strata -> chi2 not far above df
    assert r.breslow_day_chi2 < 4 * r.n_strata
