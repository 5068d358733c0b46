"""Invariant tests for llm_lsh_calibration (round-3 batch 15)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_lsh_calibration_tracks_the_s_curve(spark):
    rows = sorted(
        ent.queries()["llm_lsh_calibration"](spark, SF_SMALL).collect(),
        key=lambda r: r.bucket,
    )
    assert rows
    for r in rows:
        assert 0 <= r.bucket <= 9
        assert 0.0 <= r.measured_rate <= 1.0
        assert 0.0 <= r.theoretical_rate <= 1.0
        assert r.n_collided <= r.n_pairs
    # theoretical curve is strictly increasing in similarity
    theo = [r.theoretical_rate for r in rows]
    assert theo == sorted(theo)
    # high-similarity pairs must collide far more often than near-zero
    # similarity pairs (the whole point of banding); compare extremes
    # when both populated
    lo = [r for r in rows if r.bucket <= 1]
    hi = [r for r in rows if r.bucket >= 6]
    if lo and hi and sum(r.n_pairs for r in hi) >= 5:
        lo_rate = sum(r.n_collided for r in lo) / sum(r.n_pairs for r in lo)
        hi_rate = sum(r.n_collided for r in hi) / sum(r.n_pairs for r in hi)
        assert hi_rate > lo_rate
