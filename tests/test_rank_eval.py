"""Retrieval-evaluation keys (queries/rank_eval.py).

The oracle sweep pins exact values; these tests pin the METRIC
PROPERTIES that make the numbers meaningful — range bounds, the
DCG ≤ IDCG ordering, and RBO's self-identity — so a future edit that
keeps Spark/DuckDB agreement but breaks the metric's math still
fails loudly.
"""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ndcg_rows_and_bounds(spark):
    rows = ent.queries()["rank_ndcg"](spark, SF_SMALL).collect()
    assert len(rows) == 5  # one per top-5-token query
    for r in rows:
        assert 0.0 < r.ndcg10 <= 1.0, r
    # the ranker (tf/dlen) deliberately differs from the judgment
    # (min(tf,3)) — at least one query must be imperfectly ranked,
    # otherwise the key degenerates to a constant-1 report
    assert any(r.ndcg10 < 1.0 for r in rows)


def test_map_mrr_bounds_and_consistency(spark):
    rows = ent.queries()["rank_map_mrr"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ap20 <= 1.0, r
        assert 0.0 <= r.rr <= 1.0, r
        assert 0.0 <= r.p10 <= 1.0, r
        assert 0.0 <= r.recall10 <= 1.0, r
        # a nonzero P@10 implies a hit exists, so RR must be nonzero
        # and at least 1/last-possible-rank of that hit
        if r.p10 > 0:
            assert r.rr >= 1.0 / 10 or r.rr > 0


def test_rbo_bounds_and_truncation_ceiling(spark):
    row = ent.queries()["rank_rbo"](spark, SF_SMALL).collect()[0]
    assert 0 <= row.overlap50 <= 50
    # truncated RBO at depth 50 with p=0.9 cannot exceed the
    # perfect-agreement ceiling (1 - p^50)
    ceiling = 1 - 0.9**50
    assert 0.0 <= row.rbo <= ceiling + 1e-9
    # both rankers correlate with document length, so the overlap
    # must beat zero (a dead ranker pair would make the key vacuous)
    assert row.overlap50 > 0


def test_rbo_self_identity():
    """The RBO formula itself: identical rankings at depth D give
    exactly (1-p) * sum(p^(d-1) * d/d) = 1 - p^D. Checked in plain
    Python against the same closed form the query folds."""
    p, d_max = 0.9, 50
    rbo = sum((1 - p) * p ** (d - 1) * d / d for d in range(1, d_max + 1))
    assert math.isclose(rbo, 1 - p**d_max, rel_tol=1e-12)
