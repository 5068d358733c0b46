"""Invariant tests for batch 33 (markov stationary, burstiness)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_stationary_is_a_distribution_tracking_empirical(spark):
    rows = sorted(
        ent.queries()["events_markov_stationary"](spark, SF_SMALL).collect(),
        key=lambda r: r.rnk,
    )
    assert rows
    probs = [r.stationary_prob for r in rows]
    assert all(p >= 0 for p in probs)
    assert abs(sum(probs) - 1.0) < 1e-6
    assert probs == sorted(probs, reverse=True)
    # after 3 iterations from uniform the chain should track the
    # empirical mix to first order
    for r in rows:
        assert abs(r.stationary_prob - r.empirical_share) < 0.15


def test_burstiness_nonnegative_and_ranked(spark):
    rows = sorted(
        ent.queries()["llm_word_burstiness"](spark, SF_SMALL).collect(),
        key=lambda r: r.rnk,
    )
    assert rows
    bs = [r.burstiness for r in rows]
    assert bs == sorted(bs, reverse=True)
    for r in rows:
        assert r.burstiness >= -1e-9
        assert 1 <= r.df <= r.total
