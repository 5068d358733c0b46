"""Invariant tests for batch 112 (waterfill, precision, blocking)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_waterfill_feasibility(spark):
    r = ent.queries()["train_mix_cap_waterfill"](spark, SF_SMALL).collect()[0]
    assert r.n_sources > 0
    assert 0 <= r.n_capped_sources < r.n_sources
    assert 0 < r.selectable_tokens <= r.total_tokens
    assert 0.0 < r.retention <= 1.0
    # cap consistency: per-source cap = 15% of the selected mix
    assert abs(r.per_source_token_cap - 0.15 * r.selectable_tokens) < 2.0


def test_numeric_precision_clean_data(spark):
    r = ent.queries()["dq_numeric_precision"](spark, SF_SMALL).collect()[0]
    assert r.n_lines > 0
    # synthetic generator produces policy-clean numerics
    assert r.non_integer_qty == 0
    assert r.discount_out_of_policy == 0
    assert r.nonpositive_prices == 0
    assert r.negative_tax == 0


def test_blocking_strategies(spark):
    rows = ent.queries()["llm_blocking_efficiency"](spark, SF_SMALL).collect()
    names = {r.strategy for r in rows}
    assert names == {"prefix1", "prefix2", "length_band", "prefix1_lenband"}
    by = {r.strategy: r for r in rows}
    # finer keys -> fewer candidate pairs
    assert by["prefix2"].candidate_pairs <= by["prefix1"].candidate_pairs
    assert (
        by["prefix1_lenband"].candidate_pairs <= by["prefix1"].candidate_pairs
    )
    for r in rows:
        assert 0.0 <= r.pair_reduction_ratio <= 1.0
