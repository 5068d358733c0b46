"""Invariant tests for ts_holt_winters (round-3 batch 28)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_holt_winters_outputs_sane(spark):
    rows = ent.queries()["ts_holt_winters"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_hours >= 72
        # additive HW on sparse 0/1 series can dip marginally below 0
        assert r.level > -1.0
        assert r.rmse_1step >= 0
        # forecasts = level + h*trend + seasonal: they must sit within
        # a few RMSE of the level (seasonal swings are bounded by data)
        for f in (r.forecast_1, r.forecast_2, r.forecast_3):
            assert abs(f - r.level) <= 10 * (r.rmse_1step + abs(r.trend) * 3 + 1)


def test_holt_winters_beats_or_matches_naive_persistence(spark):
    """The seasonal model's in-sample one-step RMSE should not be
    dramatically worse than the series' own standard deviation (the
    RMSE of forecasting the mean) — a weak but honest quality bar."""
    from etl_framework_spark.catalog import table
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in
            ent.queries()["ts_holt_winters"](spark, SF_SMALL).collect()}
    e = table(spark, SF_SMALL, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("double").alias("n"))
    sd = {
        r.event_type: r.sd
        for r in hourly.groupBy("event_type")
        .agg(F.stddev_pop("n").alias("sd"))
        .collect()
    }
    for t, r in rows.items():
        # zero-filled spine sd is >= the grouped sd; allow slack
        assert r.rmse_1step <= 3 * (sd[t] + 1)
