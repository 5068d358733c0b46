"""Invariant tests for batch 97 (Little's law, assortment, Cochran Q)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_little_law_consistency(spark):
    r = ent.queries()["orders_little_law"](spark, SF_SMALL).collect()[0]
    assert r.n_orders > 0 and r.n_days > 0
    assert r.lambda_per_d > 0 and r.avg_flow_d > 0 and r.avg_wip > 0
    # the identity holds approximately on a finite window (edge effects)
    assert 0.5 < r.little_ratio < 1.5


def test_assortment_jaccard_ranking(spark):
    rows = ent.queries()["sales_assortment_jaccard"](spark, SF_SMALL).collect()
    assert rows
    js = [r.jaccard for r in rows]
    assert js == sorted(js, reverse=True)
    for r in rows:
        assert r.suppkey_1 < r.suppkey_2
        assert 0 < r.common_parts <= min(r.parts_1, r.parts_2)
        assert 0.0 < r.jaccard <= 1.0


def test_cochran_q_invariants(spark):
    r = ent.queries()["stats_cochran_q"](spark, SF_SMALL).collect()[0]
    assert r.n_orders > 0
    for rate in (r.rate_pos1, r.rate_pos2, r.rate_pos3):
        assert 0.0 <= rate <= 1.0
    assert r.cochran_q >= 0.0
    # exchangeable positions -> Q should be small (chi2_2 p50 ~ 1.4)
    assert r.cochran_q < 15.0
    assert r.df == 2
