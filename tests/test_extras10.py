"""Invariant tests for the batch-5 operators (extras10.py): skyline
dominance properties, the winnowing match guarantee, seasonality
conservation. Exact values are gated by tools/check.py oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def skyline(spark):
    return ent.queries()["orders_skyline"](spark, SF_SMALL).toPandas()


def test_skyline_no_mutual_dominance(skyline):
    """No skyline point dominates another skyline point in the same
    nation — within a nation, sorting by date ascending must give
    strictly decreasing prices (else the later row is dominated)."""
    for _, grp in skyline.groupby("n_name"):
        # same-date survivors must be exact price ties (neither strict)
        assert (grp.groupby("o_orderdate").o_totalprice.nunique() == 1).all()
        # a survivor must beat every strictly-earlier price, so prices
        # strictly increase with date among skyline rows
        seq = grp.groupby("o_orderdate").o_totalprice.first().sort_index()
        assert seq.is_monotonic_increasing and seq.is_unique


def test_skyline_contains_group_maxima(spark, skyline):
    """Each nation's max-price order and earliest-date order (with
    ties broken toward higher price) are never dominated, so both
    appear on the skyline."""
    o = (
        table(spark, SF_SMALL, "orders")
        .join(table(spark, SF_SMALL, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(table(spark, SF_SMALL, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_orderdate", "o_totalprice")
        .toPandas()
    )
    sky_by_nation = {n: g for n, g in skyline.groupby("n_name")}
    for n, grp in o.groupby("n_name"):
        top = grp.o_totalprice.max()
        assert (sky_by_nation[n].o_totalprice == top).any()
        first_day = grp.o_orderdate.min()
        best_first = grp[grp.o_orderdate == first_day].o_totalprice.max()
        g = sky_by_nation[n]
        assert ((g.o_orderdate == first_day) & (g.o_totalprice == best_first)).any()


def test_winnowing_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing >= w+k-1 = 6
    consecutive tokens share at least one fingerprint. Build two
    synthetic docs around a common 8-token run and check overlap."""
    from etl_framework_spark.queries.extras10 import llm_winnowing

    common = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, f"xx yy {common} zz"), (2, f"aa {common} bb cc dd")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_winnow_probe")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = llm_winnowing(spark, d).toPandas().set_index("doc_id")
        assert set(out.loc[1].fps) & set(out.loc[2].fps)


def test_winnowing_fp_is_distinct_subset(spark):
    out = ent.queries()["llm_winnowing"](spark, SF_SMALL).toPandas()
    assert (out.n_fp <= out.n_windows).all()
    assert (out.n_windows == (out.n_hashes - 3).clip(lower=1)).all()
    for fps in out.fps.head(20):
        assert list(fps) == sorted(set(fps))


def test_seasonality_conserves_events(spark):
    out = ent.queries()["events_seasonality"](spark, SF_SMALL).toPandas()
    total = table(spark, SF_SMALL, "events").count()
    assert out.n.sum() == total
    assert len(out) <= 168
    assert out.dow.between(1, 7).all() and out.hr.between(0, 23).all()
    # load_ratio is n / mean(n): its weighted identity — mean of ratios is 1
    assert abs(out.load_ratio.mean() - 1.0) < 1e-4
