"""Invariant tests for the round-3 batch 10 operators (extras26)."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_rfm_migration_conserves_users(spark):
    rows = _rows(spark, "events_rfm_migration")
    total = sum(r.n_users for r in rows)
    users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == users  # every active user lands in exactly one cell
    for r in rows:
        assert 0 <= r.q_first <= 4 and 0 <= r.q_second <= 4
        assert not (r.q_first == 0 and r.q_second == 0)  # must be active


def test_mix_temp_sweep_properties(spark):
    rows = _rows(spark, "train_mix_temp_sweep")
    by_alpha = defaultdict(list)
    for r in rows:
        by_alpha[r.alpha].append(r)
    assert set(by_alpha) == {0.2, 0.4, 0.6, 0.8, 1.0}
    for alpha, rs in by_alpha.items():
        assert abs(sum(r.weight for r in rs) - 1.0) < 1e-4
        if alpha == 1.0:  # natural sampling: boost == 1 everywhere
            for r in rs:
                assert abs(r.boost_vs_natural - 1.0) < 1e-4
    # lower temperature must flatten the mix: the max weight shrinks
    maxw = {a: max(r.weight for r in rs) for a, rs in by_alpha.items()}
    assert maxw[0.2] <= maxw[0.6] <= maxw[1.0]
