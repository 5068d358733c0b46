"""Invariant tests for batch 68 (PIT features, partial corr, EB shrink)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_pit_features_never_leak(spark):
    rows = ent.queries()["feat_pit_training_set"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.f_prior_events >= 0
        assert r.f_active_seconds >= 0
        if r.f_prior_events == 0:
            # first-ever event: features must be exactly the cold-start zeros
            assert r.f_prior_avg_value == 0.0
            assert r.f_active_seconds == 0
        else:
            assert r.f_prior_avg_value != 0.0 or r.f_prior_events > 0


def test_partial_corr_bounds(spark):
    r = ent.queries()["stats_partial_corr"](spark, SF_SMALL).collect()[0]
    for v in (r.r_xy, r.r_xz, r.r_yz, r.r_xy_given_z):
        assert -1.0 <= v <= 1.0
    # sanity: partialling a near-zero control barely moves the corr
    if abs(r.r_xz) < 0.05 and abs(r.r_yz) < 0.05:
        assert abs(r.r_xy_given_z - r.r_xy) < 0.05


def test_eb_shrinkage_pulls_everyone_in(spark):
    r = ent.queries()["stats_eb_shrinkage"](spark, SF_SMALL).collect()[0]
    assert r.prior_alpha > 0 and r.prior_beta > 0
    assert 0.0 < r.prior_mean < 1.0
    # posterior means sit strictly between raw rate and prior mean,
    # so dispersion around the prior can only shrink
    assert r.mean_abs_dev_shrunk <= r.mean_abs_dev_raw + 1e-9
    assert r.n_pulled_in >= 0.9 * r.n_suppliers  # ties aside, all move in
