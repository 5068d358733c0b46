"""Invariant tests for batch 101 (Theta, Welch ANOVA, meta-analysis)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_theta_forecast_sane(spark):
    r = ent.queries()["ts_theta_method"](spark, SF_SMALL).collect()[0]
    assert r.n_months > 12
    assert r.forecast_h1 > 0
    # h2 continues the trend direction from h1
    drift = r.forecast_h2 - r.forecast_h1
    assert abs(drift - 0.5 * r.trend_slope) < 1e-3
    # forecast blends SES level and trend line: must lie between-ish
    lo = min(r.theta_ses, r.trend_intercept + r.trend_slope * (r.n_months + 1))
    hi = max(r.theta_ses, r.trend_intercept + r.trend_slope * (r.n_months + 1))
    assert lo - 1e-6 <= r.forecast_h1 <= hi + 1e-6


def test_welch_anova_null(spark):
    r = ent.queries()["stats_welch_anova"](spark, SF_SMALL).collect()[0]
    assert r.k == 3
    assert r.welch_f >= 0.0
    assert r.df2 > 1.0
    # flags don't shift quantity -> F should be unremarkable
    assert r.welch_f < 10.0


def test_meta_analysis_consistency(spark):
    r = ent.queries()["stats_meta_analysis"](spark, SF_SMALL).collect()[0]
    assert r.n_studies > 1
    assert r.pooled_se > 0.0
    assert r.cochran_q >= 0.0
    assert 0.0 <= r.i2 < 1.0
    # null effect: pooled estimate within a few SE of zero
    assert abs(r.pooled_effect) < 6 * r.pooled_se
