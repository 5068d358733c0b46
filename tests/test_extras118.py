"""Invariant tests for batch 118 (binary seg, multi-distinct, quantiles)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_binary_segmentation(spark):
    rows = ent.queries()["ts_binary_segmentation"](spark, SF_SMALL).collect()
    assert [r.round for r in rows] == [1, 2]
    r1, r2 = rows
    # round 2 splits the LEFT segment of round 1
    assert 0 < r2.split_t < r1.split_t
    assert r1.gain >= 0 and r2.gain >= 0


def test_multi_distinct_bounds(spark):
    rows = ent.queries()["agg_multi_distinct"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.d_parts <= r.n and r.d_supps <= r.n
        assert r.d_orders <= r.n and r.d_days <= r.n
        assert min(r.d_parts, r.d_supps, r.d_orders, r.d_days) >= 1


def test_length_quantiles_order(spark):
    rows = ent.queries()["llm_length_quantiles_by_source"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.min_len <= r.p50_len <= r.p90_len <= r.max_len
        assert r.n_docs > 0
