"""Invariant tests for batch 20 (containment, changepoint, bootstrap)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_containment_dominates_jaccard(spark):
    """Containment ≥ Jaccard for every pair (min ≤ union), and every
    containment hit is a valid bounded score."""
    rows = ent.queries()["llm_dedup_containment"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.9 - 1e-9 <= r.containment <= 1.0 + 1e-9
        assert r.n_common >= 1


def test_changepoint_statistics_consistent(spark):
    rows = ent.queries()["ts_changepoint"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.cusum_peak >= 0
        assert r.mean_before >= 0 and r.mean_after >= 0
        # peak magnitude relates the two means: |S_t| = t(n-t)/n·|Δmeans|
        # so a nonzero peak requires the means to differ
        if r.cusum_peak > 1e-6:
            assert abs(r.mean_before - r.mean_after) > 0


def test_bootstrap_ci_brackets_the_mean(spark):
    rows = ent.queries()["stats_bootstrap_ci"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_resamples == 64
    assert r.ci_lo <= r.ci_hi
    # CI width shrinks like 1/sqrt(n); at sf0.001 it is still narrow
    # relative to the value scale, and must bracket the full mean
    assert bool(r.covers_mean) is True
    assert r.ci_lo <= r.mean_full <= r.ci_hi
