"""Invariant tests for batch 71 (Brier calibration, VaR/CVaR, k-core)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_brier_bins_coherent(spark):
    rows = ent.queries()["stats_brier_calibration"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n for r in rows)
    assert total > 0
    for r in rows:
        assert 0 <= r.bin <= 4
        assert 0.0 <= r.mean_predicted <= 1.0
        assert 0.0 <= r.mean_observed <= 1.0
        assert 0.0 <= r.brier_in_bin <= 1.0
        # the bin's predictions actually fall in the bin's range
        assert r.bin / 5 - 1e-9 <= r.mean_predicted <= (r.bin + 1) / 5 + 1e-9 or r.bin == 4


def test_var_cvar_ordering(spark):
    rows = ent.queries()["stats_var_cvar"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # expected shortfall is at most the VaR threshold
        assert r.cvar_5pct <= r.var_5pct + 1e-9
        # the tail holds ~5% of observations
        assert 0.01 <= r.n_tail / r.n <= 0.10


def test_kcore_peel_monotone(spark):
    rows = sorted(
        ent.queries()["graph_kcore_peel"](spark, SF_SMALL).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        # peeling only removes nodes and edges
        assert b.nodes_remaining <= a.nodes_remaining
        assert b.edges_remaining <= a.edges_remaining
    assert rows[0].nodes_remaining > 0
