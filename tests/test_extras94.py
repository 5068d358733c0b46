"""Invariant tests for batch 94 (cointegration, matrix profile, scorecard)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_cointegration_fields(spark):
    r = ent.queries()["ts_cointegration_lite"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 50
    assert -1.0 <= r.level_corr <= 1.0
    # unit-root coefficient of a stationary-ish residual is negative
    assert -2.0 < r.gamma < 0.5
    assert r.t_gamma < 5.0


def test_matrix_profile_discords(spark):
    rows = ent.queries()["ts_matrix_profile"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    dists = [r.nn_dist for r in rows]
    assert dists == sorted(dists, reverse=True)
    for r in rows:
        # exclusion zone respected
        assert abs(r.t - r.nn_t) >= 4
        # z-normalized squared distance of w=4 windows is in [0, 4w]
        assert 0.0 <= r.nn_dist <= 16.0 + 1e-6


def test_forecast_scorecard_consistency(spark):
    r = ent.queries()["ts_forecast_scorecard"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 100
    assert r.mae_snaive > 0 and r.mae_naive > 0
    assert 0.0 <= r.smape_snaive <= 2.0
    # MASE is exactly the MAE ratio on the same rows
    assert abs(r.mase - r.mae_snaive / r.mae_naive) < 1e-4
    assert r.theil_u2 > 0
