"""Invariant tests for batch 104 (Lin CCC, lead time, windowed semi)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_lin_ccc_bounds(spark):
    r = ent.queries()["stats_lin_ccc"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs > 0
    assert -1.0 <= r.pearson_r <= 1.0
    # |CCC| <= |r| always (C_b in (0, 1])
    assert abs(r.lin_ccc) <= abs(r.pearson_r) + 1e-9
    assert 0.0 < r.accuracy_cb <= 1.0 + 1e-9


def test_supplier_lead_time_ranking(spark):
    rows = ent.queries()["supplier_lead_time"](spark, SF_SMALL).collect()
    assert rows
    cvs = [r.cv for r in rows]
    assert cvs == sorted(cvs, reverse=True)
    for r in rows:
        assert r.n_lines >= 20
        assert r.mean_lag_d > 0
        assert r.sd_lag_d >= 0
        assert r.worst_lag_d >= r.mean_lag_d


def test_semi_window_share(spark):
    r = ent.queries()["join_semi_window"](spark, SF_SMALL).collect()[0]
    assert r.n_purchases > 0
    assert 0 <= r.n_with_prior_click <= r.n_purchases
    assert 0.0 <= r.assisted_share <= 1.0
