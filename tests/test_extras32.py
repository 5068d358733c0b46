"""Invariant tests for the hypothesis-testing batch (round-3 batch 16)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_welch_t_internal_consistency(spark):
    rows = ent.queries()["stats_ttest_welch"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_weekend >= 2 and r.n_weekday >= 2
        # df bounded by min(n1,n2)-1 below and n1+n2-2 above
        assert min(r.n_weekend, r.n_weekday) - 1 <= r.welch_df + 1e-6
        assert r.welch_df <= r.n_weekend + r.n_weekday - 2 + 1e-6
        # significance flag consistent with the reported t
        assert r.significant == (abs(r.t_stat) > 1.959963984540054) or (
            abs(abs(r.t_stat) - 1.959963984540054) < 1e-5
        )
        # sign of t matches sign of the mean difference
        if abs(r.mean_diff) > 1e-9:
            assert math.copysign(1, r.t_stat) == math.copysign(1, r.mean_diff)


def test_anova_decomposition_and_bounds(spark):
    rows = ent.queries()["stats_anova"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.k_groups >= 2
        assert r.ss_between >= -1e-6 and r.ss_within >= -1e-6
        assert 0.0 - 1e-9 <= r.eta_sq <= 1.0 + 1e-9
        assert r.f_stat >= 0
        # eta² must equal SSB/(SSB+SSW) as reported
        tot = r.ss_between + r.ss_within
        if tot > 1e-9:
            assert abs(r.eta_sq - r.ss_between / tot) < 1e-4


def test_cramers_v_range_and_independence(spark):
    rows = ent.queries()["stats_cramers_v"](spark, SF_SMALL).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 - 1e-9 <= r.cramers_v <= 1.0 + 1e-9
        assert r.chi2 >= -1e-6
        assert r.dof == (r.r_levels - 1) * (r.c_levels - 1)
        # synthetic columns are generated independently: V stays small
        assert r.cramers_v < 0.3


def test_levene_w_nonnegative(spark):
    rows = ent.queries()["stats_levene"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k_groups >= 2
    assert r.ms_between >= -1e-9 and r.ms_within > 0
    assert r.w_stat >= 0


def test_except_distinct_is_subset_of_except_all(spark):
    q = ent.queries()
    dist = {r.o_custkey for r in q["set_except_distinct"](spark, SF_SMALL).collect()}
    bag = [r.o_custkey for r in q["set_except"](spark, SF_SMALL).collect()]
    # EXCEPT DISTINCT ⊆ distinct(EXCEPT ALL): a key present on both
    # sides but with higher left multiplicity survives the bag
    # difference yet not the set difference, so containment is one-way.
    assert dist <= set(bag)
    assert len(bag) >= len(dist)
