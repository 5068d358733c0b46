"""Invariant tests for batch 114 (circular, robustness, source sim)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_circular_stats_bounds(spark):
    rows = ent.queries()["stats_circular_stats"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.mean_hour < 24.0
        assert 0.0 <= r.resultant_r <= 1.0
        assert r.rayleigh_z >= 0.0
        # uniform-ish synthetic times -> low concentration
        assert r.resultant_r < 0.5


def test_attack_robustness_monotone(spark):
    rows = ent.queries()["graph_attack_robustness"](spark, SF_SMALL).collect()
    assert len(rows) >= 2
    cuts = [r.max_deg for r in rows]
    assert cuts == sorted(cuts)
    nodes = [r.nodes_left for r in rows]
    edges = [r.edges_left for r in rows]
    # higher cutoff keeps more of the graph
    assert nodes == sorted(nodes)
    assert edges == sorted(edges)
    assert 0.0 <= rows[0].edge_survival <= rows[-1].edge_survival <= 1.0


def test_source_similarity_ranking(spark):
    rows = ent.queries()["llm_source_similarity_matrix"](spark, SF_SMALL).collect()
    assert rows
    js = [r.js_divergence for r in rows]
    assert js == sorted(js)
    for r in rows:
        assert r.source_1 < r.source_2
        # JSD in nats is bounded by ln(2)
        assert 0.0 <= r.js_divergence <= 0.6932
