"""Invariant tests for batch 58 (Kaplan-Meier, rendezvous, aging)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_km_monotone_and_risk_set_shrinks(spark):
    rows = sorted(
        ent.queries()["events_kaplan_meier"](spark, SF_SMALL).collect(),
        key=lambda r: r.lifetime_days,
    )
    assert rows
    prev_s, prev_n = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.km_survival <= prev_s  # survival never increases
        prev_s = r.km_survival
        if prev_n is not None:
            assert r.n_at_risk <= prev_n  # risk set only shrinks
        prev_n = r.n_at_risk
        assert r.n_churned + r.n_censored <= r.n_at_risk


def test_rendezvous_moves_far_less_than_mod(spark):
    r = ent.queries()["shard_rendezvous"](spark, SF_SMALL).collect()[0]
    # HRW churn should be near 1/9; mod churn near 8/9
    assert r.hrw_moved_frac < 0.25
    assert r.mod_moved_frac > 0.75
    assert r.hrw_moved_frac < r.mod_moved_frac / 3
    assert r.n_shards_used == 9
    assert 0 <= r.hrw_moved <= r.n_docs


def test_backlog_aging_partitions_open_orders(spark):
    rows = ent.queries()["orders_backlog_aging"](spark, SF_SMALL).collect()
    assert rows
    assert abs(sum(r.pct_of_open for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_orders > 0 and r.backlog_value > 0
        assert r.bucket[0] in "01234"
