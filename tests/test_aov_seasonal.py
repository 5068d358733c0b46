"""Invariant tests for batch 123 (mix-adjusted AOV, stability, BF)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_mix_adjusted_aov(spark):
    rows = ent.queries()["sales_mix_adjusted_aov"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.raw_aov > 0 and r.mix_adjusted_aov > 0
        assert abs(r.mix_effect - (r.raw_aov - r.mix_adjusted_aov)) < 1e-2
        # priorities are iid -> adjustment is small relative to level
        assert abs(r.mix_effect) < 0.2 * r.raw_aov


def test_profile_stability(spark):
    rows = ent.queries()["ts_seasonal_profile_stability"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.year_to == r.year_from + 1
        assert -1.0 <= r.profile_corr <= 1.0


def test_brown_forsythe_null(spark):
    r = ent.queries()["stats_brown_forsythe"](spark, SF_SMALL).collect()[0]
    assert r.k == 3
    assert r.df1 == 2 and r.df2 == r.n - 3
    assert r.bf_f >= 0.0
    # equal-variance synthetic groups -> unremarkable F
    assert r.bf_f < 10.0
