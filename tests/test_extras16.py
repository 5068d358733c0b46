"""Unit tests for the round-2 batch-11 engagement metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_stickiness_bounds(spark):
    """avg DAU can never exceed WAU → stickiness in (0, 1]; WAU is
    bounded by the total user count."""
    pdf = ent.queries()["events_stickiness"](spark, SF_SMALL).toPandas()
    assert len(pdf) > 0
    assert (pdf.stickiness > 0).all() and (pdf.stickiness <= 1).all()
    n_users = (
        table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert (pdf.wau <= n_users).all()
    assert (pdf.avg_dau <= pdf.wau).all()


def test_retention_bounds_and_recount(spark):
    """Rates live in [0, 1]; returned counts never exceed the active
    base; spot-check one day's D1 recount."""
    pdf = ent.queries()["events_retention_n"](spark, SF_SMALL).toPandas()
    assert (pdf.returned_d1 <= pdf.active_users).all()
    assert (pdf.returned_d7 <= pdf.active_users).all()
    assert ((pdf.d1_rate >= 0) & (pdf.d1_rate <= 1)).all()
    ud = (
        table(spark, SF_SMALL, "events")
        .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .distinct()
    )
    day0 = pdf.sort_values("day").iloc[0]
    users0 = {
        r["user_id"]
        for r in ud.filter(F.col("day") == day0.day).collect()
    }
    users1 = {
        r["user_id"]
        for r in ud.filter(
            F.col("day") == day0.day + __import__("pandas").Timedelta(days=1)
        ).collect()
    }
    assert day0.returned_d1 == len(users0 & users1)
