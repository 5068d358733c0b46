"""Invariant tests for batch 21 (bitmap distinct, bucketed join, JSD)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_bitmap_distinct_bounded_by_events(spark):
    rows = ent.queries()["agg_bitmap_distinct"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_users <= r.n_events


def test_bucketed_join_plan_has_no_shuffle_or_sort(spark):
    """The whole point of bucketing: the merge join must read both
    sides pre-partitioned AND pre-sorted — no Exchange, no Sort above
    the bucketed scans."""
    df = ent.queries()["join_bucketed"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin", 1)
    assert len(join_part) == 2, f"expected a SortMergeJoin:\n{plan}"
    below_join = join_part[1]
    # the aggregation above the join may legitimately shuffle; below
    # the join there must be neither a shuffle nor a sort
    assert "Exchange" not in below_join, below_join
    assert "Sort " not in below_join.replace("SortMergeJoin", ""), below_join


def test_jsd_symmetric_bounds_and_self_zero(spark):
    rows = ent.queries()["llm_js_divergence"](spark, SF_SMALL).collect()
    assert rows
    ln2 = math.log(2)
    for r in rows:
        assert r.source_a < r.source_b
        assert -1e-9 <= r.jsd <= ln2 + 1e-9
    # every unordered source pair appears exactly once
    pairs = [(r.source_a, r.source_b) for r in rows]
    assert len(pairs) == len(set(pairs))
