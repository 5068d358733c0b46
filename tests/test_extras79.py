"""Invariant tests for batch 79 (Gumbel EVT, fiscal 4-4-5, headroom)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_gumbel_return_level_ordering(spark):
    rows = ent.queries()["stats_gumbel_block_maxima"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.gumbel_beta > 0
        # the 1-in-30 return level exceeds the median block max
        assert r.return_level_30 > r.median_block_max
        assert r.n_blocks >= 20


def test_fiscal_445_structure(spark):
    rows = sorted(
        ent.queries()["sales_fiscal_445"](spark, SF_SMALL).collect(),
        key=lambda r: r.fiscal_period,
    )
    assert [r.fiscal_period for r in rows] == list(range(1, 13))
    # the 4-4-5 pattern repeats per quarter
    widths = [r.weeks_in_period for r in rows]
    assert widths == [4, 4, 5] * 4
    for r in rows:
        assert r.revenue > 0
        assert abs(r.revenue_per_week - r.revenue / r.weeks_in_period) < 0.02


def test_capacity_headroom_ordering(spark):
    rows = ent.queries()["events_capacity_headroom"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.mean_hourly <= r.p99_hourly <= r.peak_hourly
        assert r.peak_to_mean >= r.p99_to_mean >= 1.0 - 1e-9
        assert r.n_hours > 0
