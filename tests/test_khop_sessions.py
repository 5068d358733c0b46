"""Invariant tests for batch 56 (k-hop BFS, capped sessions, velocity)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_khop_levels_alternate_bipartite(spark):
    rows = sorted(
        ent.queries()["graph_khop_reach"](spark, SF_SMALL).collect(),
        key=lambda r: r.lvl,
    )
    assert rows[0].lvl == 0
    assert rows[0].n_suppliers == 1 and rows[0].n_parts == 0  # the seed
    for r in rows:
        # bipartite: even levels are suppliers, odd levels are parts
        if r.lvl % 2 == 0:
            assert r.n_parts == 0
        else:
            assert r.n_suppliers == 0
        assert r.n_suppliers + r.n_parts > 0  # empty frontiers emit no row


def test_sessionize_cap_accounting(spark):
    rows = ent.queries()["events_sessionize_cap"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # sessions = 1 + total splits; each split is gap xor cap
        assert r.n_sessions == 1 + r.n_gap_splits + r.n_cap_splits
        assert 1 <= r.n_sessions <= r.n_events


def test_velocity_windows_nested(spark):
    rows = ent.queries()["feat_velocity_windows"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # wider horizon can only see more events
        assert 1 <= r.max_burst_1h <= r.max_burst_24h <= r.max_burst_7d
        assert r.max_burst_7d <= r.n_events
        assert 1.0 <= r.avg_trailing_1h <= r.max_burst_1h
