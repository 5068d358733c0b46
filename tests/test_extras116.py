"""Invariant tests for batch 116 (post-hoc, status aging, entropy)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_posthoc_pairs(spark):
    rows = ent.queries()["stats_posthoc_pairs"](spark, SF_SMALL).collect()
    assert len(rows) == 3  # C(3,2) flag pairs
    for r in rows:
        assert r.flag_1 < r.flag_2
        assert r.pooled_se > 0
        assert abs(r.t_stat - r.mean_diff / r.pooled_se) < 1e-3
        # exchangeable flags -> small contrasts
        assert abs(r.t_stat) < 5.0
        assert r.df_within > 100


def test_status_aging_shares(spark):
    rows = ent.queries()["orders_status_aging"](spark, SF_SMALL).collect()
    assert rows
    from collections import defaultdict

    by_band = defaultdict(float)
    for r in rows:
        by_band[r.age_years] += r.share_in_age_band
        assert r.n > 0
    for s in by_band.values():
        assert abs(s - 1.0) < 1e-3


def test_entropy_ladder_decreasing(spark):
    r = ent.queries()["llm_entropy_ladder"](spark, SF_SMALL).collect()[0]
    assert r.h1 > 0
    # conditioning can only reduce per-token entropy
    assert r.h2_given_1 <= r.h1 + 1e-6
    assert r.h3_given_2 <= r.h2_given_1 + 1e-6
    assert 0.0 <= r.redundancy_at_2 <= 1.0
