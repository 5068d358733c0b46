"""Invariant tests for batch 115 (weighted t, funnel, audit sample)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_weighted_ttest_fields(spark):
    r = ent.queries()["stats_weighted_ttest"](spark, SF_SMALL).collect()[0]
    assert r.ess_r > 1 and r.ess_n > 1
    assert r.wmean_r > 0 and r.wmean_n > 0
    assert abs(r.wmean_diff - (r.wmean_r - r.wmean_n)) < 1e-3
    # flags carry no price signal -> small weighted z
    assert abs(r.weighted_z) < 5.0


def test_curation_funnel_monotone(spark):
    rows = ent.queries()["llm_curation_funnel"](spark, SF_SMALL).collect()
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    docs = [r.docs for r in rows]
    toks = [r.tokens for r in rows]
    # sequential filters only shrink the corpus
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert rows[0].token_retention == 1.0
    assert all(0.0 <= r.token_retention <= 1.0 for r in rows)


def test_audit_sample_band(spark):
    rows = ent.queries()["llm_dedup_audit_sample"](spark, SF_SMALL).collect()
    # band is data-dependent; when pairs exist they must be in-band
    for r in rows:
        assert 0.02 <= r.jaccard < 0.85
        assert r.doc_id_1 < r.doc_id_2
        assert 0 < r.common_shingles <= min(r.shingles_1, r.shingles_2)
