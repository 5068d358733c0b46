"""Invariant tests for batch 133 (positivity, XmR, saturation)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_positivity_overlap(spark):
    r = ent.queries()["stats_positivity_check"](spark, SF_SMALL).collect()[0]
    assert r.n_bins > 0
    assert 0 <= r.bins_with_overlap <= r.n_bins
    assert 0.0 <= r.overlap_coefficient <= 1.0
    # independent quantity/discount -> near-full common support
    assert r.overlap_coefficient > 0.8
    assert r.max_density_ratio >= 1.0 - 1e-6


def test_xmr_chart(spark):
    r = ent.queries()["ts_xmr_control_chart"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 100
    assert r.lcl < r.center_line < r.ucl
    # a stable-ish process: few out-of-control points
    assert r.out_of_control <= 0.1 * r.n_days
    assert 0 <= r.mr_violations <= r.n_days


def test_novelty_saturation_decreasing(spark):
    rows = ent.queries()["llm_novelty_saturation"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    shares = [r.novel_shingle_share for r in rows]
    assert all(0.0 <= s <= 1.0 for s in shares)
    # earliest decile sees the most first-time content
    assert shares[0] == max(shares)
