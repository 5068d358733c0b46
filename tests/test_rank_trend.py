"""Invariant tests for the round-3 batch 3 operators (rank_trend)."""

from __future__ import annotations

import itertools

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_spearman_bounds_and_pair_coverage(spark):
    rows = _rows(spark, "stats_spearman")
    types = {t for r in rows for t in (r.ta, r.tb)}
    expected_pairs = {
        (a, b) for a, b in itertools.combinations(sorted(types), 2)
    }
    assert {(r.ta, r.tb) for r in rows} == expected_pairs
    for r in rows:
        assert -1.0 - 1e-9 <= r.rho <= 1.0 + 1e-9
        assert r.ta < r.tb
        assert r.n_days > 0


def test_spearman_matches_scipy_style_reference(spark):
    """Cross-check one pair against a pure-Python midrank Spearman."""
    import duckdb

    rows = _rows(spark, "stats_spearman")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    daily = con.execute(
        """SELECT event_type, date_trunc('day', ts) d, count(*) n
           FROM events GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    series: dict = {}
    for et, d, n in daily:
        series.setdefault(et, {})[d] = n

    def midranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        ranks = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
                j += 1
            mid = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = mid
            i = j + 1
        return ranks

    r0 = rows[0]
    days = sorted(set(series[r0.ta]) & set(series[r0.tb]))
    xa = [series[r0.ta][d] for d in days]
    xb = [series[r0.tb][d] for d in days]
    rx, ry = midranks(xa), midranks(xb)
    n = float(len(days))
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    assert abs(rho - r0.rho) < 2e-6


def test_mannkendall_s_bounds(spark):
    rows = _rows(spark, "stats_mannkendall")
    assert rows
    for r in rows:
        max_pairs = r.n_days * (r.n_days - 1) // 2
        assert -max_pairs <= r.s_stat <= max_pairs
        assert r.trend in ("increasing", "decreasing", "none")
        if r.trend == "none":
            assert abs(r.z) <= 1.96 + 1e-6


def test_seasonal_strength_bounds(spark):
    rows = _rows(spark, "ts_seasonal_strength")
    assert rows
    for r in rows:
        assert 0.0 <= r.seasonal_strength <= 1.0
        assert 0.0 <= r.trend_strength <= 1.0


def test_semantic_outliers_are_extreme(spark):
    rows = _rows(spark, "llm_semantic_outliers")
    for r in rows:
        assert r.robust_z > 2.0
        assert r.dist >= 0.0
    # outliers must be a small minority of the corpus
    n_vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert len(rows) < 0.2 * n_vecs


def test_bloom_prefilter_matches_plain_join(spark):
    """Optimization invisibility: the bloom-prefiltered join must equal
    the plain join exactly."""
    from pyspark.sql import functions as F

    rows = {r.c_mktsegment: r for r in _rows(spark, "join_bloom_prefilter")}
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").filter(
        F.col("c_acctbal") >= 9000
    )
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
        .collect()
    )
    assert {r.c_mktsegment: (r.n_orders, r.rev) for r in plain} == {
        k: (v.n_orders, v.revenue) for k, v in rows.items()
    }
