"""Invariant tests for batch 85 (Hodges-Lehmann, McNemar, Rocchio)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_hodges_lehmann_between_extremes(spark):
    r = ent.queries()["stats_hodges_lehmann"](spark, SF_SMALL).collect()[0]
    assert r.n_walsh == r.n_groups * (r.n_groups + 1) // 2
    lo = min(r.plain_median, r.mean)
    hi = max(r.plain_median, r.mean)
    # the pseudo-median is a compromise estimator: near the others
    spread = max(abs(hi), 1.0)
    assert lo - 0.5 * spread <= r.hodges_lehmann <= hi + 0.5 * spread


def test_mcnemar_discordants_positive(spark):
    r = ent.queries()["stats_mcnemar"](spark, SF_SMALL).collect()[0]
    assert r.n10 >= 0 and r.n01 >= 0
    assert r.n10 + r.n01 > 0
    assert r.mcnemar_chi2 >= 0.0
    expect = (r.n10 - r.n01) ** 2 / (r.n10 + r.n01)
    assert abs(r.mcnemar_chi2 - expect) < 1e-3


def test_rocchio_feedback_reasonable(spark):
    r = ent.queries()["vec_rocchio_feedback"](spark, SF_SMALL).collect()[0]
    assert 0 <= r.top10_overlap <= 10
    # pulling the query toward its own top-10 should keep most of them
    assert r.top10_overlap >= 5
    assert -1.0 <= r.old_top_score <= 1.0
    assert -1.0 <= r.new_top_score <= 1.0
