"""Invariant tests for batch 130 (DOM effect, ratios, discount curve)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_day_of_month_effect(spark):
    rows = ent.queries()["ts_day_of_month_effect"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    devs = [abs(r.rel_deviation) for r in rows]
    assert devs == sorted(devs, reverse=True)
    for r in rows:
        assert 1 <= r.dom <= 31
        assert r.n_days > 0
        assert r.mean_qty > 0


def test_table_ratio_policy(spark):
    rows = ent.queries()["dq_table_ratio_check"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.numerator_rows > 0 and r.denominator_rows > 0
        assert abs(r.ratio - r.numerator_rows / r.denominator_rows) < 1e-3
        # the synthetic schema respects its fan-out policy
        assert r.within_policy


def test_discount_response_flat(spark):
    rows = ent.queries()["sales_discount_response"](spark, SF_SMALL).collect()
    assert rows
    base = [r for r in rows if r.disc_band == 0]
    assert base and base[0].qty_lift_vs_no_discount == 0.0
    for r in rows:
        assert r.n > 0
        # independent synthetic discounting -> near-flat response
        assert abs(r.qty_lift_vs_no_discount) < 0.2
