"""Invariant tests for batch 23 (partition pruning, data card)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_partition_pruning_shows_in_plan(spark):
    df = ent.queries()["scan_partition_pruning"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the day predicate must be a PartitionFilter on the scan, NOT a
    # post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in seg and (">=" in seg or "isnotnull" in seg), seg


def test_partition_pruning_reads_only_window(spark):
    rows = ent.queries()["scan_partition_pruning"](spark, SF_SMALL).collect()
    days = sorted(r.day for r in rows)
    assert len(days) == 7
    assert days[0] == "2024-01-08" and days[-1] == "2024-01-14"
    for r in rows:
        assert r.n_events >= r.n_users >= 1


def test_data_card_internal_consistency(spark):
    rows = ent.queries()["llm_data_card"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= 1
        assert r.vocab_size <= r.n_tokens
        assert 0.0 < r.ttr <= 1.0
        assert 0.0 <= r.exact_dup_rate < 1.0
        assert r.p50_chars <= r.p90_chars
        assert r.n_langs >= 1 and r.top_lang
