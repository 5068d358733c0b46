"""Invariant tests for batch 18 (pagerank, bigram F1, FK audit)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_pagerank_ranks_and_positivity(spark):
    rows = sorted(
        ent.queries()["graph_pagerank"](spark, SF_SMALL).collect(),
        key=lambda r: r.rnk,
    )
    assert rows and rows[0].rnk == 1
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    prs = [r.pagerank for r in rows]
    assert all(p > 0 for p in prs)
    # ranked descending
    assert prs == sorted(prs, reverse=True)
    # hubs beat the uniform floor: top token must exceed 1/|V| damped floor
    assert prs[0] > prs[-1]


def test_bigram_f1_bounds_and_symmetric_evidence(spark):
    rows = ent.queries()["llm_bigram_overlap_f1"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.5 - 1e-9 <= r.f1 <= 1.0 + 1e-9
        assert r.n_common >= 1


def test_fk_orphans_clean_on_synthetic_schema(spark):
    rows = ent.queries()["dq_fk_orphans"](spark, SF_SMALL).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.n_rows > 0
        assert 0 <= r.n_orphans <= r.n_rows
        # the driver's generator is referentially consistent
        assert r.n_orphans == 0
