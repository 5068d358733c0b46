"""Invariant tests for batch 76 (negbin fit, promise SLA, ESS)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_negbin_params_consistent(spark):
    rows = ent.queries()["stats_negbin_fit"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mean_daily > 0
        assert abs(r.dispersion_ratio - r.var_daily / r.mean_daily) < 1e-3
        if r.nb_r is not None:
            assert r.nb_r > 0
            assert 0.0 < r.nb_p <= 1.0
            # implied NB mean r(1-p)/p equals the sample mean
            implied = r.nb_r * (1 - r.nb_p) / r.nb_p
            assert abs(implied - r.mean_daily) / r.mean_daily < 0.01


def test_promise_attainment_near_target(spark):
    rows = ent.queries()["orders_promise_attainment"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # ceil(p90) promise ⇒ attainment at or above ~90%
        assert r.attainment >= 0.88
        assert r.attainment <= 1.0
        if r.attainment < 1.0:
            assert r.mean_miss_days > 0


def test_ess_uniform_is_full_n(spark):
    rows = {r.scheme: r for r in ent.queries()["train_ess_weights"](spark, SF_SMALL).collect()}
    assert set(rows) == {"uniform", "by_length", "by_quality"}
    u = rows["uniform"]
    assert abs(u.ess - u.n_docs) < 1e-3  # uniform weights keep everything
    assert abs(u.ess_ratio - 1.0) < 1e-6
    for r in rows.values():
        assert 0.0 < r.ess_ratio <= 1.0 + 1e-9
