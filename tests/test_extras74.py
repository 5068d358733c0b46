"""Invariant tests for batch 74 (pattern match, median CI, window PPMI)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_pattern_match_counts_nested(spark):
    r = ent.queries()["events_pattern_match"](spark, SF_SMALL).collect()[0]
    assert r.n_sessions > 0
    for c in (r.n_view_click_purchase, r.n_repeat_purchase, r.n_with_error):
        assert 0 <= c <= r.n_sessions
    assert abs(r.vcp_rate - r.n_view_click_purchase / r.n_sessions) < 1e-4
    assert r.avg_session_events >= 1.0


def test_median_ci_brackets_median(spark):
    rows = ent.queries()["stats_median_ci"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.ci_lo <= r.median <= r.ci_hi
        # rank span ~ 2 * 1.96 * sqrt(n)/... sanity: grows with n
        assert r.rank_span >= 2
        assert r.n > 10


def test_ppmi_pairs_positive_and_supported(spark):
    rows = ent.queries()["llm_cooc_ppmi_window"](spark, SF_SMALL).collect()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.ppmi >= b.ppmi
    for r in rows:
        assert r.ppmi >= 0.0  # positive PMI clamps at zero
        assert r.n_cooc >= 15
        assert r.w1 and r.w2
