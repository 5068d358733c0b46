"""Invariant tests for batch 136 (weekend, modality, quarter-end)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_weekend_effect_null(spark):
    r = ent.queries()["sales_weekend_effect"](spark, SF_SMALL).collect()[0]
    assert r.weekend_lines > 0 and r.weekday_lines > 0
    # roughly 2/7 of lines land on weekends
    share = r.weekend_lines / (r.weekend_lines + r.weekday_lines)
    assert 0.15 < share < 0.45
    # no weekend effect in synthetic data
    assert abs(r.qty_gap_z) < 5.0
    # unit price (price/qty) is heavy-tailed; allow sampling noise
    assert abs(r.unit_price_premium) < 0.3


def test_modality_coverage(spark):
    r = ent.queries()["dq_modality_coverage"](spark, SF_SMALL).collect()[0]
    assert r.n_docs > 0 and r.n_vecs > 0
    assert 0 <= r.docs_without_vec <= r.n_docs
    assert 0 <= r.vecs_without_doc <= r.n_vecs
    assert 0.0 <= r.embedding_coverage <= 1.0
    # testdata generates aligned modalities
    assert r.embedding_coverage == 1.0


def test_quarter_end_loading(spark):
    r = ent.queries()["sales_quarter_end_loading"](spark, SF_SMALL).collect()[0]
    assert r.total_revenue > 0
    assert 0 <= r.last_week_revenue <= r.total_revenue
    assert 0.0 < r.uniform_expectation < 0.2
    # uniform shipping -> loading factor near 1
    assert 0.5 < r.loading_factor < 2.0
