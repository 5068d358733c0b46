"""Invariant tests for batch 72 (AUC, growth accounting, hour-dow)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_auc_in_unit_interval_and_informative(spark):
    r = ent.queries()["stats_auc_pit"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert r.n_pos > 0 and r.n_neg > 0
    # past purchase behavior should predict future purchases at least
    # as well as chance (generous lower bound for tiny scales)
    assert r.auc > 0.40


def test_growth_accounting_identity(spark):
    rows = sorted(
        ent.queries()["events_growth_accounting"](spark, SF_SMALL).collect(),
        key=lambda r: r.week,
    )
    assert rows
    for r in rows:
        # actives partition exactly into the three inflow states
        assert r.active == r.new_users + r.retained + r.resurrected
        assert r.churned_from_prev >= -1e-9 or r.churned_from_prev < 0
    # first week: everyone is new
    assert rows[0].active == rows[0].new_users
    for prev, cur in zip(rows, rows[1:]):
        # churn identity: last week's actives minus this week's retained
        assert cur.churned_from_prev == prev.active - cur.retained
        assert 0 <= cur.retained <= prev.active


def test_hour_dow_shares(spark):
    rows = ent.queries()["events_hour_dow_profile"](spark, SF_SMALL).collect()
    assert len(rows) >= 100
    total = sum(r.share_of_week for r in rows)
    assert abs(total - 1.0) < 1e-3
    by_dow = {}
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hour_of_day <= 23
        by_dow.setdefault(r.dow, 0.0)
        by_dow[r.dow] += r.share_of_day
    for s in by_dow.values():
        assert abs(s - 1.0) < 1e-3
