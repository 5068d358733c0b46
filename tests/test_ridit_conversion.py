"""Invariant tests for batch 113 (ridit, window sweep, seasonal MK)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ridit_centering(spark):
    r = ent.queries()["stats_ridit"](spark, SF_SMALL).collect()[0]
    assert r.n_big > 0 and r.n_small > 0
    assert 0.0 < r.mean_ridit_big < 1.0
    assert 0.0 < r.mean_ridit_small < 1.0
    # weighted mean of group ridits equals 0.5 by construction
    w = (
        r.n_big * r.mean_ridit_big + r.n_small * r.mean_ridit_small
    ) / (r.n_big + r.n_small)
    assert abs(w - 0.5) < 1e-3
    assert abs(r.ridit_shift - (r.mean_ridit_big - r.mean_ridit_small)) < 1e-5


def test_window_sweep_monotone(spark):
    rows = ent.queries()["events_conversion_window_sweep"](
        spark, SF_SMALL
    ).collect()
    assert [r.window_s for r in rows] == [900, 3600, 21600, 86400]
    shares = [r.assisted_share for r in rows]
    # longer lookback can only credit more purchases
    assert all(shares[i] <= shares[i + 1] + 1e-9 for i in range(3))
    assert all(0.0 <= s <= 1.0 for s in shares)


def test_seasonal_mk_null(spark):
    r = ent.queries()["stats_seasonal_mann_kendall"](spark, SF_SMALL).collect()[0]
    assert r.n_seasons == 12
    assert r.var_s > 0
    # stationary synthetic demand -> no monotone trend
    assert abs(r.smk_z) < 4.0
