"""Invariant tests for batch 65 (M4, kNN reciprocity, token bucket)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_m4_envelope_invariants(spark):
    rows = ent.queries()["ts_m4_downsample"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
        assert 0 <= r.argmin_hour_offset <= 23
        assert 0 <= r.argmax_hour_offset <= 23
        assert 1 <= r.n_points <= 24


def test_knn_graph_counts(spark):
    r = ent.queries()["vec_knn_reciprocity"](spark, SF_SMALL).collect()[0]
    assert r.n_edges == r.n_nodes * 5  # exact k=5 out-degree
    assert 0.0 <= r.reciprocity <= 1.0
    assert 5 <= r.max_indegree or r.n_nodes <= 6
    assert 0 <= r.n_never_neighbor < r.n_nodes


def test_token_bucket_conservation(spark):
    rows = ent.queries()["events_token_bucket"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dropped < r.n_events  # first event always admits
        assert 0.0 <= r.drop_rate < 1.0
        assert 0.0 <= r.final_tokens <= 10.0
