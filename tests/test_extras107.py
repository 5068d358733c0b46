"""Invariant tests for batch 107 (IVF sweep, share shift, bucketing)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ivf_recall_monotone(spark):
    rows = ent.queries()["vec_ivf_recall_sweep"](spark, SF_SMALL).collect()
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    recalls = [r.recall_at_10 for r in rows]
    # probing more lists can only find more of the truth
    assert all(recalls[i] <= recalls[i + 1] + 1e-9 for i in range(3))
    assert all(0.0 <= x <= 1.0 for x in recalls)
    # probing most lists should recover most of the exact answer
    assert recalls[-1] > 0.7


def test_share_shift_sums(spark):
    rows = ent.queries()["sales_share_shift"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.share_1995 <= 1.0 and 0.0 <= r.share_1996 <= 1.0
        assert abs(r.share_delta - (r.share_1996 - r.share_1995)) < 1e-5
    deltas = [abs(r.share_delta) for r in rows]
    assert deltas == sorted(deltas, reverse=True)


def test_length_bucketing_saves(spark):
    r = ent.queries()["train_length_bucketing"](spark, SF_SMALL).collect()[0]
    assert r.real_tokens <= r.padded_sorted <= r.padded_arrival
    assert 0.0 <= r.waste_sorted <= r.waste_arrival < 1.0
    assert 0.0 <= r.compute_saved < 1.0
