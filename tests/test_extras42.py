"""Invariant tests for batch 26 (observe, freshness, new/returning)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_observe_metrics_consistent_with_direct_query(spark):
    from etl_framework_spark.catalog import table
    from pyspark.sql import functions as F

    row = ent.queries()["dq_observe_metrics"](spark, SF_SMALL).collect()[0]
    li = table(spark, SF_SMALL, "lineitem").filter(F.col("l_quantity") > 10)
    direct = li.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("tp"),
    ).collect()[0]
    assert row.n_rows == direct.n
    assert abs(row.total_price - direct.tp) < 1e-6
    assert row.min_qty <= row.max_qty
    assert 0 <= row.n_high_discount <= row.n_rows


def test_freshness_global_max_has_zero_lag(spark):
    rows = ent.queries()["dq_freshness"](spark, SF_SMALL).collect()
    assert rows
    lags = [r.hours_behind for r in rows]
    assert min(lags) == 0.0  # some type owns the global max
    for r in rows:
        assert r.hours_behind >= 0
        assert r.stale == (r.hours_behind > 6) or abs(r.hours_behind - 6) < 1e-6


def test_new_vs_returning_conservation(spark):
    rows = sorted(
        ent.queries()["events_new_vs_returning"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows
    # day 1: everyone active is new
    assert rows[0].returning_users == 0
    for r in rows:
        assert r.new_users + r.returning_users >= 1
        assert 0.0 <= r.returning_share <= 1.0
    # total new users across days = total distinct users
    from etl_framework_spark.catalog import table

    total_users = (
        table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert sum(r.new_users for r in rows) == total_users
