"""Invariant tests for batch 117 (discount curve, hubness, coverage)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_volume_discount_curve(spark):
    rows = ent.queries()["sales_volume_discount_curve"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert rows[0].unit_price_step is None  # first band has no prior
    for r in rows:
        assert r.n > 0
        assert r.avg_unit_price > 0
        assert 0.0 <= r.avg_discount <= 0.1


def test_hubness_fields(spark):
    r = ent.queries()["vec_hubness"](spark, SF_SMALL).collect()[0]
    assert r.n_vecs > 0
    # k-occurrence is estimated from the 1-in-5 anchor sample (the
    # round-6 bounded rewrite): total votes = k * n_anchors, so the
    # mean over ALL vectors is k * n_anchors / n, not k
    from etl_framework_spark.catalog import table

    emb = table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    n_anchors = emb.filter("vec_id % 5 = 0").count()
    expected_mean = 10.0 * n_anchors / n
    assert abs(r.mean_k_occ - expected_mean) < 1e-3
    assert r.max_k_occ >= 1
    assert 0 <= r.n_antihubs < r.n_vecs
    # skewness is finite and positive-ish in high-dim spaces
    assert -5.0 < r.k_occ_skewness < 50.0


def test_lang_coverage(spark):
    rows = ent.queries()["llm_lang_coverage"](spark, SF_SMALL).collect()
    assert rows
    total_share = sum(r.token_share for r in rows)
    assert abs(total_share - 1.0) < 1e-3
    for r in rows:
        assert r.n_docs > 0 and r.n_tokens > 0
        assert r.n_sources >= 1
        # HHI bounded by [1/n_sources, 1]
        assert 1.0 / r.n_sources - 1e-6 <= r.source_hhi <= 1.0
