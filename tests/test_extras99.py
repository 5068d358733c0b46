"""Invariant tests for batch 99 (Friedman, WoE/IV, greedy coverage)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_friedman_invariants(spark):
    r = ent.queries()["stats_friedman"](spark, SF_SMALL).collect()[0]
    assert r.n_blocks > 0
    assert r.k == 3 and r.df == 2
    assert r.friedman_chi2 >= 0.0
    # exchangeable positions -> chi2 small
    assert r.friedman_chi2 < 15.0


def test_woe_iv_consistency(spark):
    rows = ent.queries()["feat_woe_iv"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_good > 0 and r.n_bad > 0
        # IV contribution shares WoE's sign structure: (gs-bs)*woe >= 0
        assert r.iv_contribution >= -1e-9
    # priorities are independent of return flag -> total IV tiny
    assert sum(r.iv_contribution for r in rows) < 0.01


def test_greedy_coverage_monotone(spark):
    rows = ent.queries()["llm_greedy_coverage"](spark, SF_SMALL).collect()
    assert rows
    gains = [r.marginal for r in rows]
    # submodularity: marginal gains are non-increasing
    assert all(gains[i] >= gains[i + 1] for i in range(len(gains) - 1))
    covs = [r.covered_tokens for r in rows]
    assert covs == sorted(covs)
    assert covs[-1] == sum(gains)
    assert all(0.0 < r.coverage_share <= 1.0 for r in rows)
    # no doc picked twice
    assert len({r.doc_id for r in rows}) == len(rows)
