"""Invariant tests for batch 60 (periodogram, key discovery, cluster SE)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_periodogram_shares_sum_to_one(spark):
    rows = ent.queries()["ts_periodogram"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert abs(sum(r.power_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.power >= 0.0
        assert r.n_points == rows[0].n_points  # same series everywhere


def test_candidate_keys_identify_orderkey(spark):
    rows = {r.candidate: r for r in ent.queries()["dq_candidate_keys"](spark, SF_SMALL).collect()}
    assert rows["o_orderkey"].is_key
    assert rows["o_orderkey"].dup_ratio == 0.0
    # date alone cannot key an orders table
    assert not rows["o_orderdate"].is_key
    for r in rows.values():
        assert r.n_distinct <= r.n_rows
        assert 0.0 <= r.dup_ratio < 1.0


def test_cluster_se_never_below_half_naive(spark):
    rows = ent.queries()["stats_cluster_se"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_clusters <= r.n_events
        assert r.se_naive > 0 and r.se_cluster > 0
        # design effect is the squared SE ratio by construction
        ratio = (r.se_cluster / r.se_naive) ** 2
        assert abs(ratio - r.design_effect) < 0.01 * max(1.0, r.design_effect)
