"""Invariant tests for batch 86 (Hotelling diag, price CV, dead columns)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_hotelling_null_behavior(spark):
    r = ent.queries()["vec_hotelling_diag"](spark, SF_SMALL).collect()[0]
    assert r.n_dims == 64
    assert r.t2_diag >= 0.0
    # labels are independent of embeddings: mean z^2 near 1, few sig dims
    assert 0.2 < r.mean_z2_per_dim < 3.0
    assert r.n_sig_dims <= 20
    assert r.n0 > 1 and r.n1 > 1


def test_price_dispersion_ranked(spark):
    rows = ent.queries()["sales_price_dispersion"](spark, SF_SMALL).collect()
    assert rows
    cvs = [r.price_cv for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r.n_lines >= 10
        assert r.price_cv > 0
        assert r.mean_unit_price > 0


def test_constant_column_detector_counts(spark):
    rows = {r.watched_column: r for r in ent.queries()["dq_constant_column_detect"](spark, SF_SMALL).collect()}
    assert set(rows) == {"event_type", "value_band", "user_band"}
    for r in rows.values():
        assert 1 <= r.recent_distinct <= r.hist_distinct
        assert r.went_constant == (r.recent_distinct <= 1)
    # healthy synthetic data: nothing went constant
    assert not any(r.went_constant for r in rows.values())
