"""Invariant tests for batch 63 (hysteresis alarms, log-rank, projection)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_alarm_hysteresis_accounting(spark):
    rows = ent.queries()["events_alarm_hysteresis"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_alarms_raised
        # every raised alarm spends at least one hour in alarm
        assert r.alarm_hours >= r.n_alarms_raised
        assert r.alarm_hours <= r.n_hours
        if r.n_alarms_raised == 0:
            assert r.alarm_hours == 0 and not r.alarm_at_end


def test_logrank_null_holds_for_parity_split(spark):
    r = ent.queries()["stats_logrank"](spark, SF_SMALL).collect()[0]
    assert r.variance >= 0.0
    assert r.chi2 >= 0.0
    # id parity cannot change survival: the null should not be
    # rejected spectacularly (allow flukes up to chi2=15)
    assert r.chi2 < 15.0
    assert r.observed_grp1 >= 0.0 and r.expected_grp1 >= 0.0


def test_bipartite_projection_ranked_pairs(spark):
    rows = ent.queries()["graph_bipartite_weights"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert a.shared_parts >= b.shared_parts
    for r in rows:
        assert r.s1 < r.s2
        assert r.shared_parts >= 1
