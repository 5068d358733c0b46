"""Invariant tests for batch 31 (percentile_disc, dynamic pruning)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_percentile_disc_monotone_and_observed(spark):
    from etl_framework_spark.catalog import table

    rows = ent.queries()["agg_percentile_disc"](spark, SF_SMALL).collect()
    assert rows
    vals = {}
    for r in table(spark, SF_SMALL, "events").select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r.event_type, set()).add(round(r.value, 6))
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75 <= r.p90
        # DISC returns actually-observed values, not interpolations
        for p in (r.p25, r.p50, r.p75, r.p90):
            assert p in vals[r.event_type]


def test_dynamic_pruning_in_plan_and_mondays_only(spark):
    import datetime

    df = ent.queries()["join_partition_pruned_dim"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]
    rows = df.collect()
    assert rows
    for r in rows:
        d = datetime.date.fromisoformat(r.day)
        assert d.weekday() == 0  # Monday
        assert r.n_events > 0
