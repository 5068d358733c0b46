"""Invariant tests for batch 90 (RSI, Bollinger, spectral entropy)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_rsi_bounds(spark):
    r = ent.queries()["ts_rsi"](spark, SF_SMALL).collect()[0]
    assert r.n_diffs > 0
    assert 0 <= r.up_days <= r.n_diffs
    assert r.avg_gain >= 0.0 and r.avg_loss >= 0.0
    assert 0.0 <= r.rsi <= 100.0
    # balanced random-ish demand series -> RSI near the middle
    assert 20.0 < r.rsi < 80.0


def test_bollinger_invariants(spark):
    r = ent.queries()["ts_bollinger"](spark, SF_SMALL).collect()[0]
    assert r.n_days_eval > 0
    # 2-sigma breaches are rare by construction
    assert r.n_above + r.n_below < 0.15 * r.n_days_eval
    assert 0.0 < r.avg_bandwidth <= r.max_bandwidth


def test_spectral_entropy_bounds(spark):
    r = ent.queries()["ts_spectral_entropy"](spark, SF_SMALL).collect()[0]
    assert r.n_freqs == 16
    assert 0.0 <= r.spectral_entropy_norm <= 1.0
    assert 0.0 <= r.spectral_flatness <= 1.0 + 1e-9
