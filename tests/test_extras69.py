"""Invariant tests for batch 69 (Granger screen, quality frontier, index)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_granger_r2_nesting(spark):
    r = ent.queries()["ts_granger_lite"](spark, SF_SMALL).collect()[0]
    # the full model nests the restricted one: R2 can only grow
    assert -1e-9 <= r.r2_restricted <= r.r2_full <= 1.0 + 1e-9
    assert abs(r.r2_gain - (r.r2_full - r.r2_restricted)) < 1e-4
    assert r.f_stat >= -1e-9
    assert r.n_days >= 20


def test_quality_frontier_monotone(spark):
    rows = sorted(
        ent.queries()["train_quality_tradeoff"](spark, SF_SMALL).collect(),
        key=lambda r: r.cut_percentile,
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        # a higher cut keeps fewer docs/tokens but higher mean quality
        assert a.docs_kept >= b.docs_kept
        assert a.tokens_kept_share >= b.tokens_kept_share - 1e-9
        assert a.mean_score_kept <= b.mean_score_kept + 1e-9
        assert a.score_threshold <= b.score_threshold + 1e-9
    for r in rows:
        assert 0.0 < r.tokens_kept_share <= 1.0


def test_seasonal_index_normalized(spark):
    rows = ent.queries()["sales_seasonal_index"](spark, SF_SMALL).collect()
    assert len(rows) == 12
    mean_idx = sum(r.seasonal_index for r in rows) / 12
    assert abs(mean_idx - 1.0) < 1e-3  # indices average to one
    for r in rows:
        assert r.seasonal_index > 0
        assert 1 <= r.month_of_year <= 12
        assert r.n_years >= 1
