"""Invariant tests for batch 100 (ORC sink, Bowker, nearest centroid)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_orc_roundtrip_fidelity(spark):
    rows = ent.queries()["sink_roundtrip_orc"](spark, SF_SMALL).collect()
    assert len(rows) == 2  # linestatus F / O
    for r in rows:
        assert r.n > 0
        assert r.sum_qty >= r.n  # quantities are >= 1
        assert r.sum_price > 0


def test_bowker_invariants(spark):
    r = ent.queries()["stats_bowker"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs > 0
    assert 1 <= r.n_offdiag_cells <= 10  # 5x5 upper triangle
    assert r.bowker_chi2 >= 0.0
    assert r.df == r.n_offdiag_cells
    # priorities are iid across orders -> no directional drift
    assert r.bowker_chi2 < 30.0


def test_nearest_centroid_bounds(spark):
    r = ent.queries()["vec_nearest_centroid"](spark, SF_SMALL).collect()[0]
    assert r.n_vecs > 0
    assert 0 <= r.n_correct <= r.n_vecs
    assert abs(r.accuracy - r.n_correct / r.n_vecs) < 1e-5
    # labeled clusters are separable enough to beat chance (1/10)
    assert r.accuracy > 0.2
    assert 1 <= r.n_used_centroids <= 10
