"""Invariant tests for batch 96 (boilerplate, TwoNN, Page-Hinkley)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_boilerplate_profile(spark):
    rows = ent.queries()["llm_boilerplate_shingles"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.shared_shingles <= r.n_shingles
        assert r.max_docs_per_shingle >= 1
        assert 0.0 <= r.affected_doc_share <= 1.0
        # shared shingles imply affected docs and vice versa
        assert (r.shared_shingles > 0) == (r.docs_affected > 0)


def test_two_nn_dim_range(spark):
    r = ent.queries()["vec_two_nn_dim"](spark, SF_SMALL).collect()[0]
    assert r.n_points > 0
    assert r.mean_log_ratio > 0.0
    # estimate must land between 1 and the ambient dimension 64
    assert 1.0 <= r.intrinsic_dim <= 64.0


def test_page_hinkley_bounds(spark):
    r = ent.queries()["ts_page_hinkley"](spark, SF_SMALL).collect()[0]
    assert r.n_days > 100
    assert r.max_ph >= 0.0
    assert 0 <= r.days_in_alarm <= r.n_days
    # first alarm exists iff some day is in alarm
    assert (r.first_alarm_day is not None) == (r.days_in_alarm > 0)
