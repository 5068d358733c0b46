"""Invariant tests for batch 93 (Chow, ICC, Durbin-Watson)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_chow_invariants(spark):
    r = ent.queries()["stats_chow_test"](spark, SF_SMALL).collect()[0]
    assert r.n == r.n_pre + r.n_post
    assert r.n_pre > 0 and r.n_post > 0
    # pooled SSR can never be below the sum of segment SSRs
    assert r.ssr_pooled >= r.ssr_split - 1e-6
    assert r.chow_f >= 0.0
    assert r.df1 == 2 and r.df2 == r.n - 4


def test_icc_invariants(spark):
    r = ent.queries()["stats_icc"](spark, SF_SMALL).collect()[0]
    assert r.n_groups > 0 and r.n_rows >= 2 * r.n_groups
    assert r.msb > 0 and r.msw > 0
    assert 2.0 <= r.k0  # every group has >= 2 lines
    assert -1.0 <= r.icc <= 1.0
    # uniform random quantities -> near-zero intraclass correlation
    assert abs(r.icc) < 0.2


def test_durbin_watson_range(spark):
    r = ent.queries()["stats_durbin_watson"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 100
    assert 0.0 <= r.dw <= 4.0
    assert abs(r.rho_approx - (1.0 - r.dw / 2.0)) < 1e-5
    # iid-ish daily totals -> DW near 2
    assert 1.3 < r.dw < 2.7
