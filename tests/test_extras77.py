"""Invariant tests for batch 77 (energy distance, permutation, subscription)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_energy_distance_nonneg_identity(spark):
    r = ent.queries()["vec_energy_distance"](spark, SF_SMALL).collect()[0]
    assert r.n0 > 1 and r.n1 > 1
    # energy distance is non-negative (up to fold noise)
    assert r.energy_distance >= -1e-6
    assert (
        abs(
            r.energy_distance
            - (2 * r.mean_cross_dist - r.mean_within_0 - r.mean_within_1)
        )
        < 1e-4
    )
    assert r.mean_cross_dist > 0


def test_permutation_null_not_rejected(spark):
    r = ent.queries()["stats_permutation_test"](spark, SF_SMALL).collect()[0]
    assert r.n_permutations == 20
    assert 0.0 < r.p_value <= 1.0
    assert r.mean_perm_abs_diff <= r.max_perm_abs_diff + 1e-9
    # permutations must actually differ from each other (a degenerate
    # hash would give mean == max exactly)
    assert r.mean_perm_abs_diff < r.max_perm_abs_diff
    # add-one p-value consistency
    expected_p = (r.n_as_extreme + 1) / 21
    assert abs(r.p_value - expected_p) < 1e-4


def test_subscription_regularity_ranked(spark):
    rows = ent.queries()["orders_subscription_detect"](spark, SF_SMALL).collect()
    assert rows
    cvs = [r.gap_cv for r in rows]
    assert cvs == sorted(cvs)
    for r in rows:
        assert r.n_orders >= 5
        assert r.mean_gap_days > 0
        assert (r.gap_cv < 0.5) == r.subscription_like
