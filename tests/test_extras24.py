"""Invariant tests for the round-3 batch 8 operators (extras24)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_weighted_median_halves_the_weight(spark):
    from pyspark.sql import functions as F

    rows = _rows(spark, "agg_weighted_median")
    assert rows
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    n = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "o_totalprice")
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in base:
        per[r.nation].append(float(r.o_totalprice))
    for r in rows:
        prices = sorted(per[r.nation])
        total = sum(prices)
        below = sum(p for p in prices if p < r.weighted_median_price - 1e-6)
        above = sum(p for p in prices if p > r.weighted_median_price + 1e-6)
        # defining property: neither side strictly exceeds half the weight
        assert below <= total / 2 + 1e-6
        assert above <= total / 2 + 1e-6
        # weighted median of a right-skewed money distribution sits at or
        # above the unweighted mean's neighborhood only sometimes — just
        # require it to be a real observed price
        assert any(abs(p - r.weighted_median_price) < 1e-6 for p in prices)


def test_interval_merge_coverage_bounds(spark):
    rows = _rows(spark, "ts_interval_merge")
    assert rows
    iv_us = 30 * 60 * 1_000_000
    for r in rows:
        assert 1 <= r.n_intervals <= r.n_events
        # each merged interval spans at least one base interval, and
        # coverage can't exceed events * interval length (no overlap credit)
        assert r.covered_us >= r.n_intervals * iv_us
        assert r.covered_us <= r.n_events * iv_us
        assert r.longest_us >= iv_us
