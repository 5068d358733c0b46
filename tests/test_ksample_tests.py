"""Invariant tests for batch 89 (Kruskal-Wallis, Wilcoxon, Bartlett)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_kruskal_wallis_invariants(spark):
    r = ent.queries()["stats_kruskal_wallis"](spark, SF_SMALL).collect()[0]
    assert r.k == 3 and r.df == 2
    assert r.n > 0
    assert r.h >= 0.0
    # heavy integer ties -> correction strictly below 1, but near it
    assert 0.9 < r.tie_correction < 1.0
    assert r.h_tie_corrected >= r.h  # dividing by c<1 only grows H


def test_wilcoxon_invariants(spark):
    r = ent.queries()["stats_wilcoxon_signed_rank"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs > 0
    # W+ + W- == n(n+1)/2 (total of all midranks)
    total = r.n_pairs * (r.n_pairs + 1) / 2.0
    assert abs((r.w_plus + r.w_minus) - total) < 0.02
    # line-2 vs line-1 quantities are exchangeable -> |z| small
    assert abs(r.z) < 5.0


def test_bartlett_invariants(spark):
    r = ent.queries()["stats_bartlett"](spark, SF_SMALL).collect()[0]
    assert r.k == 3 and r.df == 2
    assert r.pooled_var > 0
    assert r.var_ratio >= 1.0
    assert r.bartlett_t >= 0.0
    # uniform quantities per flag -> variances nearly equal
    assert r.var_ratio < 1.5
