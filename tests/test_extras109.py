"""Invariant tests for batch 109 (monotonic ids, 2D hist, VR test)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_id_time_monotonic_fields(spark):
    r = ent.queries()["dq_id_time_monotonic"](spark, SF_SMALL).collect()[0]
    assert r.n_steps > 0
    assert 0 <= r.inversions <= r.n_steps
    assert 0.0 <= r.inversion_rate <= 1.0
    assert r.worst_backstep_s >= 0
    assert (r.worst_backstep_s > 0) == (r.inversions > 0)


def test_histogram_2d_marginals(spark):
    rows = ent.queries()["agg_histogram_2d"](spark, SF_SMALL).collect()
    assert rows
    # row shares sum to 1 within each qty band
    from collections import defaultdict

    by_row = defaultdict(float)
    for r in rows:
        by_row[r.qty_band] += r.row_share
        assert r.lift_vs_independence > 0
    for s in by_row.values():
        assert abs(s - 1.0) < 1e-3
    # independent synthetic bands -> lift near 1 everywhere
    assert all(0.5 < r.lift_vs_independence < 2.0 for r in rows)


def test_variance_ratio_profile(spark):
    rows = ent.queries()["ts_variance_ratio"](spark, SF_SMALL).collect()
    assert [r.q for r in rows] == [2, 4, 8]
    for r in rows:
        assert r.variance_ratio > 0.0
        # stationary-ish daily totals: VR < 1 and shrinking-ish
        assert r.variance_ratio < 2.0
