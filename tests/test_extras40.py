"""Invariant tests for batch 24 (poisson gof, power, lorenz)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_poisson_gof_dispersion_consistency(spark):
    rows = ent.queries()["stats_poisson_gof"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_hours >= 2
        assert r.mean_rate > 0 and r.var_rate >= 0
        # dispersion equals var/mean as reported
        assert abs(r.dispersion - r.var_rate / r.mean_rate) < 1e-4
        # flag consistent with the 3-sigma band
        band = 1 + 3 * (2.0 / (r.n_hours - 1)) ** 0.5
        assert r.overdispersed == (r.dispersion > band) or (
            abs(r.dispersion - band) < 1e-5
        )


def test_power_analysis_scales_inversely_with_effect(spark):
    rows = ent.queries()["stats_power_analysis"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_per_arm >= 1
        assert r.n_per_arm_raw <= r.n_per_arm <= r.n_per_arm_raw + 1
        assert r.sd_value >= 0
        # closed form sanity: n ≈ 2(z sum)² (sd/mde)²
        zsum = 1.959963984540054 + 0.8416212335729143
        expect = 2 * zsum * zsum * (r.sd_value / r.mde_abs) ** 2
        assert abs(expect - r.n_per_arm_raw) / max(expect, 1) < 0.01


def test_lorenz_monotone_and_normalized(spark):
    rows = sorted(
        ent.queries()["events_lorenz_deciles"](spark, SF_SMALL).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    # deciles sort ascending by user total, but ntile buckets can be
    # unequal at tiny n — the monotone quantity is the PER-USER share
    per_user = [r.decile_share / r.n_users for r in rows]
    assert all(b >= a - 1e-6 for a, b in zip(per_user, per_user[1:]))
    shares = [r.decile_share for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-4
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)
