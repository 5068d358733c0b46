"""Invariant tests for batch 66 (Fleiss ensemble, Hill tail, assortativity)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_fleiss_kappa_bounds_and_counts(spark):
    r = ent.queries()["llm_quality_ensemble"](spark, SF_SMALL).collect()[0]
    assert r.n_unanimous <= r.n_docs
    assert r.n_majority_pass <= r.n_docs
    assert 0.0 <= r.p_pass <= 1.0
    # observed pairwise agreement is a probability and at least 1/3
    # (with 3 raters and 2 categories, at least one pair must agree)
    assert 1 / 3 - 1e-9 <= r.p_observed <= 1.0
    assert -1.0 <= r.fleiss_kappa <= 1.0


def test_hill_alpha_positive_and_threshold_ordered(spark):
    rows = ent.queries()["stats_hill_tail"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.k_used == 100
        assert r.tail_threshold > 0
        # top-k values exceed the threshold, so hill_h > 0 and alpha > 0
        assert r.hill_h > 0
        assert r.hill_alpha > 0
        assert abs(r.hill_alpha * r.hill_h - 1.0) < 1e-3


def test_assortativity_in_range(spark):
    r = ent.queries()["graph_assortativity"](spark, SF_SMALL).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edges >= 1
    assert r.n_nodes >= 2
    # handshake: mean degree * nodes == 2 * edges
    assert abs(r.mean_degree * r.n_nodes - 2 * r.n_edges) < 1e-3
