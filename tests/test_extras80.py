"""Invariant tests for batch 80 (TZ shift, Markov entropy, lognormal)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_tz_shift_stat_bounds(spark):
    r = ent.queries()["dq_tz_shift_detect"](spark, SF_SMALL).collect()[0]
    assert r.chi2 >= 0.0
    assert 0.0 <= r.max_hour_share_shift <= 1.0
    # stationary synthetic clock: the halves should broadly agree
    assert r.max_hour_share_shift < 0.25


def test_markov_entropy_bounded_by_uniform(spark):
    r = ent.queries()["events_markov_entropy_rate"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.entropy_rate_nats <= math.log(5.0) + 1e-6
    assert 0.0 <= r.normalized_vs_uniform <= 1.0 + 1e-6
    assert abs(r.perplexity - math.exp(r.entropy_rate_nats)) < 0.01 * r.perplexity
    assert r.n_transition_types <= 25  # at most 5x5 transitions


def test_lognormal_fit_consistency(spark):
    r = ent.queries()["llm_length_lognormal_fit"](spark, SF_SMALL).collect()[0]
    assert r.lognorm_sigma > 0
    assert r.fitted_median_chars > 0
    assert 0.0 <= r.max_decile_cdf_gap <= 1.0
    assert abs(r.fitted_median_chars - math.exp(r.lognorm_mu)) < 0.01 * r.fitted_median_chars
    assert (r.max_decile_cdf_gap < 0.10) == r.lognormal_plausible
