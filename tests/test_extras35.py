"""Invariant tests for batch 19 (hurst, JL projection, user entropy)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_hurst_in_unit_range(spark):
    rows = ent.queries()["ts_hurst"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # R/S slopes live in (0, 1) for any real series; allow slack
        # for short-series bias
        assert -0.2 < r.hurst < 1.2


def test_jl_distortion_concentrates_near_one(spark):
    rows = ent.queries()["vec_random_projection"](spark, SF_SMALL).collect()
    assert rows
    ds = [r.distortion for r in rows]
    assert all(d > 0 for d in ds)
    mean = sum(ds) / len(ds)
    # JL unbiasedness: E[distortion] = 1; k=16 gives sd ≈ sqrt(2/16) ≈ .35,
    # so the MEAN over hundreds of pairs sits well inside (0.8, 1.2)
    assert 0.8 < mean < 1.2


def test_user_entropy_histogram_bounds(spark):
    import math

    rows = ent.queries()["events_user_entropy"](spark, SF_SMALL).collect()
    assert rows
    total_types = 10  # generous upper bound on |event types|
    for r in rows:
        assert r.n_users > 0
        assert r.avg_events >= 1
        assert -1e-9 <= r.avg_entropy <= math.log2(total_types)
        # bucket consistent with its average
        assert r.bucket <= r.avg_entropy / 0.25 + 1e-6
        assert r.avg_entropy / 0.25 < r.bucket + 1 + 1e-6
