"""Unit tests for the round-2 batch-8 operators (extras13.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_decompose_reconstructs_series(spark):
    """trend + seasonal + remainder == cnt (to rounding) for every
    (event_type, day) cell, and seasonal depends only on (type, dow)."""
    pdf = ent.queries()["ts_decompose"](spark, SF_SMALL).toPandas()
    recon = pdf.trend + pdf.seasonal + pdf.remainder
    assert (abs(recon - pdf.cnt) < 1e-4).all()
    pdf["dow"] = pdf.day.dt.dayofweek  # pandas: 0=Mon
    per_cell = pdf.groupby(["event_type", "dow"]).seasonal.nunique()
    assert (per_cell == 1).all()


def test_decompose_seasonal_sums_near_zero(spark):
    """Mean seasonal component per event type is ~0 (residual means
    cancel across days by construction of the per-dow average)."""
    pdf = ent.queries()["ts_decompose"](spark, SF_SMALL).toPandas()
    for _, grp in pdf.groupby("event_type"):
        assert abs(grp.remainder.mean()) < 1.0  # centered residuals


def test_drawdown_bounds(spark):
    """Drawdown is <= 0, one row per active user, and a user whose
    values are all positive has drawdown 0 (equity only rises)."""
    pdf = ent.queries()["ts_drawdown"](spark, SF_SMALL).toPandas()
    ev = table(spark, SF_SMALL, "events")
    assert len(pdf) == ev.select("user_id").distinct().count()
    assert (pdf.max_drawdown <= 0).all()
    allpos = (
        ev.groupBy("user_id")
        .agg(F.min("value").alias("mn"))
        .filter(F.col("mn") >= 0)
        .select("user_id")
        .toPandas()
    )
    if len(allpos):
        sub = pdf[pdf.user_id.isin(allpos.user_id)]
        assert (sub.max_drawdown == 0).all()
