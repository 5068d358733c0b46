"""Invariant tests for the round-3 batch 13 operators (extras29)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_jarque_bera_uniform_flags_non_normal(spark):
    rows = _rows(spark, "stats_jarque_bera")
    for r in rows:
        assert r.n_customers >= 10
        assert r.jb_stat >= 0.0
        # uniform balances: platykurtic (negative excess kurtosis)
        assert r.excess_kurtosis < 1.0
        assert r.non_normal == (r.jb_stat > 5.991464547107979)


def test_sen_slope_within_quartiles(spark):
    rows = _rows(spark, "ts_sen_slope")
    assert rows
    for r in rows:
        assert r.slope_q1 <= r.sen_slope <= r.slope_q3
        max_pairs = 30 * 29 // 2
        assert 1 <= r.n_pairs <= max_pairs
