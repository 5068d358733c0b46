"""Invariant tests for batch 25 (distinctive ngrams, error budget,
capture-recapture)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_distinctive_ngrams_ranked_by_lift(spark):
    rows = ent.queries()["llm_distinctive_ngrams"](spark, SF_SMALL).collect()
    assert rows
    by_src = {}
    for r in rows:
        assert r.lift > 0
        assert r.n_occurrences >= 5
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        lifts = [r.lift for r in rs]
        assert lifts == sorted(lifts, reverse=True)
        assert len(rs) <= 5


def test_error_budget_running_consistency(spark):
    rows = sorted(
        ent.queries()["events_error_budget"](spark, SF_SMALL).collect(),
        key=lambda r: r.day,
    )
    assert rows
    cum_e = cum_n = 0
    for r in rows:
        assert 0 <= r.n_errors <= r.n_events
        assert abs(r.error_rate - r.n_errors / r.n_events) < 1e-4
        assert abs(r.burn_rate - r.error_rate / 0.01) < 1e-3
        cum_e += r.n_errors
        cum_n += r.n_events
        expect_remaining = 1 - cum_e / (cum_n * 0.01)
        assert abs(r.budget_remaining - expect_remaining) < 1e-4
        assert r.budget_breached == (cum_e > cum_n * 0.01)


def test_capture_recapture_estimates_population(spark):
    rows = ent.queries()["stats_capture_recapture"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.m <= min(r.n1, r.n2)
    assert r.n_hat >= max(r.n1, r.n2) - 1
    # heavy-user synthetic data: both windows see nearly everyone, so
    # the estimate should land near the truth
    assert abs(r.rel_err) < 0.5
