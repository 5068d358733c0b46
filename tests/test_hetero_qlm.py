"""Invariant tests for batch 82 (Breusch-Pagan, QL retrieval, Fisher)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_breusch_pagan_stat_valid(spark):
    r = ent.queries()["stats_breusch_pagan"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.r2_aux <= 1.0
    assert r.lm_stat >= 0.0
    assert abs(r.lm_stat - r.n * r.r2_aux) < 0.01 * max(1.0, r.lm_stat)


def test_query_likelihood_ranked_negative_logprobs(spark):
    rows = sorted(
        ent.queries()["llm_query_likelihood"](spark, SF_SMALL).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        assert a.ql_logprob >= b.ql_logprob
    for r in rows:
        assert r.ql_logprob < 0.0  # log-probabilities


def test_fisher_between_laspeyres_paasche(spark):
    r = ent.queries()["sales_price_index_fisher"](spark, SF_SMALL).collect()[0]
    assert r.n_brands >= 10
    lo, hi = sorted((r.laspeyres, r.paasche))
    assert lo - 1e-6 <= r.fisher <= hi + 1e-6  # geometric mean lies between
    assert r.laspeyres > 0 and r.paasche > 0
    assert abs(r.substitution_gap - (r.laspeyres - r.paasche)) < 1e-4
