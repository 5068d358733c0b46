"""Invariant tests for batch 105 (Theil, EOQ, self-similarity)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_theil_decomposition(spark):
    r = ent.queries()["agg_theil_index"](spark, SF_SMALL).collect()[0]
    assert r.n_customers > 0
    assert r.theil_total >= 0.0
    assert r.theil_between >= -1e-6
    assert r.theil_within >= -1e-6
    # exact additivity of the decomposition
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 1e-5
    assert 0.0 <= r.between_share <= 1.0


def test_eoq_savings(spark):
    rows = ent.queries()["orders_eoq_policy"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.eoq > 0
        # EOQ is the cost minimizer: never worse than current policy
        assert r.cost_eoq <= r.cost_current + 1e-6
        assert 0.0 <= r.savings_share < 1.0
    savs = [r.savings_share for r in rows]
    assert savs == sorted(savs, reverse=True)


def test_self_similarity_bounds(spark):
    rows = ent.queries()["llm_doc_self_similarity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.self_cosine <= 1.0
    cs = [r.self_cosine for r in rows]
    assert cs == sorted(cs)
