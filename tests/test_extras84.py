"""Invariant tests for batch 84 (Fieller CI, silhouette, error-load)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_fieller_ci_brackets_ratio(spark):
    rows = ent.queries()["stats_fieller_ratio_ci"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.ci_is_finite  # big n: denominator far from zero
        assert r.fieller_lo <= r.price_per_unit <= r.fieller_hi
        assert r.fieller_hi - r.fieller_lo > 0


def test_silhouette_bounds_and_coherence(spark):
    rows = ent.queries()["vec_silhouette_centroid"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.min_silhouette <= r.mean_silhouette <= 1.0
        assert 0 <= r.n_misplaced <= r.n_vectors
        if r.min_silhouette >= 0:
            assert r.n_misplaced == 0


def test_error_under_load_stats_valid(spark):
    r = ent.queries()["events_error_under_load"](spark, SF_SMALL).collect()[0]
    assert r.n_hours > 100
    assert 0.0 <= r.mean_error_rate <= 1.0
    assert -1.0 <= r.load_erate_corr <= 1.0
    assert (r.load_erate_corr > 0.3) == r.degrades_under_load
