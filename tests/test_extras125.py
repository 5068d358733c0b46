"""Invariant tests for batch 125 (trading days, fertility, bounds)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_trading_day_adjustment(spark):
    rows = ent.queries()["sales_trading_day_adjusted"](spark, SF_SMALL).collect()
    assert len(rows) == 12
    for r in rows:
        # months have 20-23 weekdays
        assert 20 <= r.business_days <= 23
        assert r.revenue > 0
        assert abs(r.rev_per_busday - r.revenue / r.business_days) < 1.0


def test_fertility_bounds(spark):
    rows = ent.queries()["llm_fertility_by_source"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens  # BPE splits, never merges words
        assert 1.0 <= r.fertility < 3.0
        assert r.chars_per_bpe_token > 1.0


def test_date_bounds_clean(spark):
    rows = ent.queries()["dq_date_bounds"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_rows > 0
        assert r.min_val <= r.max_val
        # generator stays inside the policy windows
        assert r.out_of_bounds == 0
