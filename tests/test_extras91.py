"""Invariant tests for batch 91 (sourcing, temporal sanity, perfect order)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_single_source_histogram(spark):
    rows = ent.queries()["dq_single_source_parts"](spark, SF_SMALL).collect()
    assert rows
    total_share = sum(r.part_share for r in rows)
    assert abs(total_share - 1.0) < 1e-4
    for r in rows:
        assert r.min_suppliers <= r.avg_suppliers <= r.max_suppliers
        assert r.n_parts > 0


def test_temporal_sanity_counts(spark):
    r = ent.queries()["dq_temporal_sanity"](spark, SF_SMALL).collect()[0]
    assert r.n_lines >= r.n_orders > 0
    # synthetic ship dates are independent of order dates, so hard
    # violations exist — the audit's job is to COUNT them faithfully
    assert 0 <= r.ship_before_order_lines <= r.n_lines
    assert abs(r.hard_violation_rate - r.ship_before_order_lines / r.n_lines) < 1e-6
    assert 0 <= r.orders_span_over_120d <= r.n_orders
    assert r.avg_ship_span_d >= 0.0


def test_perfect_order_dominance(spark):
    rows = ent.queries()["orders_perfect_order"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # an order is perfect only if every line is on time
        assert r.perfect_order_rate <= r.line_fill_rate + 1e-9
        assert 0.0 <= r.perfect_order_rate <= 1.0
