"""Invariant tests for batch 121 (greenlist, degree Gini, hygiene)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_greenlist_null(spark):
    r = ent.queries()["llm_greenlist_bias"](spark, SF_SMALL).collect()[0]
    assert r.n_docs > 0
    # hash parity splits the vocab roughly in half
    assert 0.3 < r.corpus_green_share < 0.7
    assert r.min_z <= r.max_z
    # clean corpus: flagged docs are at most a small tail
    assert r.n_flagged <= max(3, 0.05 * r.n_docs)


def test_degree_gini_bounds(spark):
    r = ent.queries()["graph_degree_gini"](spark, SF_SMALL).collect()[0]
    assert r.n_nodes > 1
    assert r.mean_degree > 0
    assert 0.0 <= r.degree_gini < 1.0


def test_string_hygiene_clean(spark):
    rows = ent.queries()["dq_string_hygiene"](spark, SF_SMALL).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_rows > 0
        # synthetic strings are generator-clean
        assert r.untrimmed == 0
        assert r.double_spaced == 0
        assert r.empty_strings == 0
