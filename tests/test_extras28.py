"""Invariant test for join_range_bucketed (round-3 batch 12)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_bucketed_band_join_equals_plain_band_join(spark):
    """Optimization invisibility: the bucketed rewrite must equal the
    naive non-equi band join exactly."""
    from pyspark.sql import functions as F

    rows = {r.band_id: r for r in
            ent.queries()["join_range_bucketed"](spark, SF_SMALL).collect()}
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    bands = spark.range(40).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 4000).cast("double").alias("lo"),
        (F.col("id") * 4000 + 6000).cast("double").alias("hi"),
    )
    plain = (
        orders.join(
            bands,
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
        .collect()
    )
    assert {r.band_id: (r.n, r.rev) for r in plain} == {
        k: (v.n_orders, v.revenue) for k, v in rows.items()
    }
    # bands with width > step overlap, so an in-range order can hit
    # two bands: band-hit total must be at least the in-range count
    in_range = orders.filter(
        (F.col("o_totalprice") >= 0) & (F.col("o_totalprice") < 40 * 4000 + 2000)
    ).count()
    hits = sum(v.n_orders for v in rows.values())
    assert hits > 0
    assert hits >= in_range  # each in-range order hits >= 1 band
