"""Invariant tests for batch 106 (stream join, MI matrix, SampEn)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_stream_join_counts(spark):
    r = ent.queries()["stream_join"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs >= r.n_views_converting
    assert r.n_pairs >= r.n_purchases_assisted
    assert r.n_users <= r.n_views_converting
    assert r.n_pairs >= 0


def test_mi_matrix_structure(spark):
    rows = ent.queries()["feat_mi_matrix"](spark, SF_SMALL).collect()
    assert len(rows) == 6  # C(4,2) feature pairs
    for r in rows:
        # MI is non-negative (quantization can dip epsilon below 0)
        assert r.mi_nats >= -1e-6
        assert r.card_a >= 2 and r.card_b >= 2
        # independent synthetic features -> near-zero dependence
        assert r.mi_nats < 0.05


def test_sample_entropy_fields(spark):
    r = ent.queries()["ts_sample_entropy"](spark, SF_SMALL).collect()[0]
    assert r.n_templates > 100
    # A-matches are a subset of B-matches
    assert 0 < r.matches_m3 <= r.matches_m2
    assert r.sample_entropy >= 0.0
