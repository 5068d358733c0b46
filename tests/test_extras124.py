"""Invariant tests for batch 124 (collisions, PI coverage, shift)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_fingerprint_collisions(spark):
    rows = ent.queries()["llm_fingerprint_collision"](spark, SF_SMALL).collect()
    assert [r.prefix_hex_chars for r in rows] == [4, 6, 8]
    colls = [r.collisions for r in rows]
    # longer prefixes can only collide less
    assert colls == sorted(colls, reverse=True)
    for r in rows:
        assert 0 <= r.collisions < r.n_full_hashes
        assert r.expected_collisions >= 0.0


def test_naive_pi_coverage_monotone(spark):
    r = ent.queries()["ts_naive_pi_coverage"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 100
    assert r.residual_sigma > 0
    assert 0.0 < r.cover_1s <= r.cover_95 <= r.cover_99 <= 1.0
    # near-gaussian day-over-day noise
    assert 0.5 < r.cover_1s < 0.85
    assert r.cover_95 > 0.85


def test_dedup_centroid_shift(spark):
    r = ent.queries()["vec_dedup_centroid_shift"](spark, SF_SMALL).collect()[0]
    assert 0 < r.n_kept <= r.n_all
    assert r.n_dims == 64
    assert r.centroid_l2_shift >= 0.0
    # removing a few duplicates barely moves the centroid
    assert r.centroid_cosine > 0.9
