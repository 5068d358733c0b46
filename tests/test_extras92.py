"""Invariant tests for batch 92 (MATTR, position bias, participation ratio)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_mattr_bounds(spark):
    rows = ent.queries()["llm_mattr"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        # MATTR of a w-token window is in (0, 1]; windows need n >= w
        assert 0.0 < r.mattr <= 1.0
        assert 0.0 < r.ttr_full <= 1.0
        assert r.n_windows == r.n_tokens - 25 + 1
        # MATTR >= per-window floor 1/w
        assert r.mattr >= 1.0 / 25 - 1e-9
    # ascending by mattr
    ms = [r.mattr for r in rows]
    assert ms == sorted(ms)


def test_position_bias_shares(spark):
    rows = ent.queries()["llm_position_bias"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.head_count >= 0 and r.tail_count >= 0
        assert 0.0 <= r.head_share <= 1.0 and 0.0 <= r.tail_share <= 1.0
    # ranked by |log_lift| descending
    lifts = [abs(r.log_lift) for r in rows]
    assert all(lifts[i] >= lifts[i + 1] - 1e-9 for i in range(len(lifts) - 1))


def test_participation_ratio_bounds(spark):
    r = ent.queries()["vec_participation_ratio"](spark, SF_SMALL).collect()[0]
    assert r.n_dims == 64
    assert r.n_vecs > 0
    assert 1.0 <= r.participation_ratio <= r.n_dims + 1e-6
    assert 0.0 < r.pr_ratio <= 1.0 + 1e-9
    # top dim carries at least 1/d of the variance
    assert r.top_dim_var_share >= 1.0 / r.n_dims - 1e-9
