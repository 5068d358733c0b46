"""Invariant tests for batch 135 (bigram OOV, Mood, persistence)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_bigram_oov_split(spark):
    r = ent.queries()["llm_bigram_oov_split"](spark, SF_SMALL).collect()[0]
    assert r.test_bigrams > 0
    assert 0 <= r.oov_types <= r.test_types
    assert 0.0 <= r.oov_token_rate <= 1.0
    # type rate >= token rate (OOV types are by definition rare)
    assert r.oov_type_rate >= r.oov_token_rate - 1e-6


def test_mood_median(spark):
    r = ent.queries()["stats_mood_median"](spark, SF_SMALL).collect()[0]
    assert r.k == 3 and r.df == 2
    assert 1 <= r.grand_median <= 50
    assert r.mood_chi2 >= 0.0
    # exchangeable flags -> small chi2
    assert r.mood_chi2 < 15.0


def test_growth_persistence(spark):
    r = ent.queries()["ts_growth_persistence"](spark, SF_SMALL).collect()[0]
    assert r.n_transitions > 10
    assert 0.0 <= r.p_up_given_up <= 1.0
    assert 0.0 <= r.p_up_given_down <= 1.0
    assert abs(r.persistence - (r.p_up_given_up - r.p_up_given_down)) < 1e-4
