"""Invariant tests for batch 55 (partial merge, bitemporal, irregular EWMA)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

from pyspark.sql import functions as F
from etl_framework_spark.catalog import table


def test_partial_merge_equals_direct_aggregation(spark):
    rows = {r.l_returnflag: r for r in ent.queries()["agg_partial_merge"](spark, SF_SMALL).collect()}
    li = table(spark, SF_SMALL, "lineitem")
    direct = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("l_quantity").alias("mean"),
            F.var_samp("l_quantity").alias("var"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    assert set(rows) == set(direct)
    for f, r in rows.items():
        d = direct[f]
        # the merge of shard states must reproduce the direct answer
        assert r.n_rows == d.n
        # query output is rounded to 6 decimals
        assert math.isclose(r.mean_qty, d.mean, abs_tol=1e-6)
        assert math.isclose(r.var_qty, d.var, rel_tol=1e-6, abs_tol=1e-5)
        assert r.min_qty == d.mn and r.max_qty == d.mx
        assert 1 <= r.n_partials <= 8


def test_bitemporal_late_snapshot_sees_no_less(spark):
    rows = ent.queries()["cdc_bitemporal"](spark, SF_SMALL).collect()
    early = {r.cust: r for r in rows if r.snapshot == "early"}
    late = {r.cust: r for r in rows if r.snapshot == "late"}
    # transaction time only ADDS visibility: every early cust exists late,
    # with at least as many visible versions and a >= valid_from choice
    assert set(early) <= set(late)
    for c, e in early.items():
        l = late[c]
        assert l.n_visible >= e.n_visible
        assert l.valid_from >= e.valid_from
    # late arrivals must actually change some answers for the key to
    # demonstrate bitemporality
    assert any(late[c].version_id != e.version_id for c, e in early.items()) or len(
        late
    ) > len(early)


def test_irregular_ewma_is_bounded_by_observed_values(spark):
    res = {r.user_id: r for r in ent.queries()["ts_ewma_irregular"](spark, SF_SMALL).collect()}
    ev = table(spark, SF_SMALL, "events")
    bounds = {
        r.user_id: r
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(res) == set(bounds)
    for u, r in res.items():
        b = bounds[u]
        # a convex combination of observations stays inside their range
        assert b.lo - 1e-6 <= r.ewma_value <= b.hi + 1e-6
        assert r.n_events == b.n
        assert r.span_s >= 0
