"""Invariant tests for batch 29 (tfidf cosine, clustering coeff)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_tfidf_cosine_bounds_and_agreement_with_jaccard(spark):
    q = ent.queries()
    rows = q["llm_tfidf_cosine_pairs"](spark, SF_SMALL).collect()
    assert rows
    pairs = set()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.8 - 1e-9 <= r.cos_tfidf <= 1.0 + 1e-6
        pairs.add((r.id_a, r.id_b))
    # high tf-idf cosine pairs should heavily overlap containment hits
    # (both detect near-identical blocked pairs on this corpus)
    cont = {
        (r.id_a, r.id_b)
        for r in q["llm_dedup_containment"](spark, SF_SMALL).collect()
    }
    if cont:
        assert len(pairs & cont) > 0


def test_clustering_coeff_histogram_bounds(spark):
    rows = ent.queries()["graph_clustering_coeff"](spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_nodes for r in rows)
    assert total > 0
    for r in rows:
        assert 0 <= r.bucket <= 10
        assert 0.0 - 1e-9 <= r.avg_coeff <= 1.0 + 1e-9
        assert r.avg_degree >= 2
        # bucket consistent with its mean
        assert r.bucket <= r.avg_coeff * 10 + 1e-6
        assert r.avg_coeff * 10 < r.bucket + 1 + 1e-6
