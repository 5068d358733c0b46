"""Invariant tests for batch 110 (sign test, triplets, turning points)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_sign_test_null(spark):
    r = ent.queries()["stats_sign_test"](spark, SF_SMALL).collect()[0]
    assert r.n_nonzero > 0
    assert 0 <= r.n_positive <= r.n_nonzero
    assert abs(r.positive_share - r.n_positive / r.n_nonzero) < 1e-5
    # exchangeable pairs -> small z
    assert abs(r.sign_z) < 5.0


def test_triplet_accuracy(spark):
    r = ent.queries()["vec_triplet_accuracy"](spark, SF_SMALL).collect()[0]
    assert r.n_triplets > 0
    assert 0 <= r.n_satisfied <= r.n_triplets
    assert abs(r.triplet_accuracy - r.n_satisfied / r.n_triplets) < 1e-5
    # weakly-separated synthetic clusters: not far from chance, but valid
    assert 0.3 < r.triplet_accuracy < 1.0


def test_turning_points_near_expected(spark):
    r = ent.queries()["ts_turning_points"](spark, SF_SMALL).collect()[0]
    assert r.n_interior > 100
    assert 0 < r.turning_points <= r.n_interior
    assert abs(r.expected_tp - 2 * r.n_interior / 3) < 1e-3
    # iid-ish daily totals -> z in a sane band
    assert abs(r.tp_z) < 6.0
