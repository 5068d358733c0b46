"""Invariant tests for batch 131 (vector ops, diversity, Benford-2)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_vector_ops_identities(spark):
    rows = ent.queries()["fn_vector_ops"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # unit-normalized embeddings
        assert abs(r.l2_norm - 1.0) < 1e-3
        assert r.l1_norm >= r.l2_norm
        # parallelogram identity: ||a+b||^2 - 2a.b == ||a||^2 + ||b||^2
        assert abs(r.parallelogram_residual - 2.0) < 1e-3
        assert -1.0 <= r.dot <= 1.0


def test_source_diversity(spark):
    rows = ent.queries()["vec_source_diversity"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_vecs > 1
        assert -1.0 <= r.mean_pairwise_cosine <= 1.0
        assert abs(r.diversity - (1.0 - r.mean_pairwise_cosine)) < 1e-4


def test_benford_second_digit(spark):
    rows = ent.queries()["stats_benford_second"](spark, SF_SMALL).collect()
    assert [r.second_digit for r in rows] == list(range(10))
    total_obs = sum(r.observed_share for r in rows)
    total_exp = sum(r.benford_share for r in rows)
    assert abs(total_obs - 1.0) < 1e-3
    assert abs(total_exp - 1.0) < 1e-3
    for r in rows:
        assert abs(r.deviation - (r.observed_share - r.benford_share)) < 1e-4
