"""Invariant tests for batch 134 (deseasonalized anomalies, radius, parity)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_deseasonalized_anomalies(spark):
    r = ent.queries()["events_anomaly_deseasonalized"](spark, SF_SMALL).collect()[0]
    assert r.n_hours > 100
    assert r.raw_anomalies >= 0 and r.deseasonalized_anomalies >= 0
    # removing a profile can only shrink (or hold) the residual sigma
    assert r.sigma_reduction_factor >= 1.0 - 1e-3


def test_cluster_radius(spark):
    rows = ent.queries()["vec_cluster_radius"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_vecs > 0
        assert 0 < r.mean_radius <= r.max_radius
        assert r.straggler_ratio >= 1.0


def test_price_parity(spark):
    rows = ent.queries()["sales_price_parity"](spark, SF_SMALL).collect()
    assert rows
    ratios = [r.parity_ratio for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    for r in rows:
        assert r.n_nations >= 3
        assert r.min_unit_price <= r.max_unit_price
        assert r.parity_ratio >= 1.0
