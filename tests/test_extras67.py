"""Invariant tests for batch 67 (OR-join rewrite, Deming, dup payments)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_or_join_pairs_unique_and_justified(spark):
    rows = ent.queries()["join_or_decomposed"](spark, SF_SMALL).collect()
    assert rows
    pairs = [(r.c_custkey, r.s_suppkey) for r in rows]
    assert len(pairs) == len(set(pairs))  # union-distinct deduped
    for r in rows:
        # every surviving pair satisfies at least one disjunct
        assert r.nation_match or r.band_match


def test_deming_steeper_than_ols_magnitude(spark):
    r = ent.queries()["stats_deming"](spark, SF_SMALL).collect()[0]
    assert r.n >= 20
    # Deming corrects OLS attenuation: same sign, |slope| >= |OLS|
    if r.ols_slope != 0:
        assert (r.deming_slope > 0) == (r.ols_slope > 0)
        assert abs(r.deming_slope) >= abs(r.ols_slope) - 1e-6


def test_duplicate_payments_rule_holds(spark):
    rows = ent.queries()["dq_duplicate_payments"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.k1 < r.k2
        assert abs(r.gap_days) <= 7
        assert 0.0 <= r.amount_rel_diff <= 0.10 + 1e-9
        hi = max(r.amount_1, r.amount_2)
        lo = min(r.amount_1, r.amount_2)
        assert abs((hi - lo) / hi - r.amount_rel_diff) < 1e-3
