"""Invariant tests for batch 51 (BH FDR, Kendall tau-b, trimmed mean)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_fdr_bh_stepup_structure(spark):
    rows = ent.queries()["stats_fdr_bh"](spark, SF_SMALL).collect()
    assert len(rows) >= 5
    m = len(rows)
    by_rank = sorted(rows, key=lambda r: r.p_rank)
    # ranks are a permutation of 1..m and p-values ascend with rank
    assert [r.p_rank for r in by_rank] == list(range(1, m + 1))
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.p_value <= b.p_value
    # rejections are exactly a prefix of the p-value ordering
    flags = [r.rejected for r in by_rank]
    if any(flags):
        kstar = max(i for i, f in enumerate(flags) if f)
        assert all(flags[: kstar + 1]) and not any(flags[kstar + 1 :])
        # the boundary rank satisfies the BH inequality
        assert by_rank[kstar].p_value <= (kstar + 1) * 0.10 / m
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert 0.0 <= r.return_rate <= 1.0


def test_kendall_tau_pair_accounting(spark):
    r = ent.queries()["stats_kendall_tau"](spark, SF_SMALL).collect()[0]
    assert r.n_pairs == r.n_points * (r.n_points - 1) // 2
    assert (
        r.concordant + r.discordant + r.ties_x + r.ties_y
        <= r.n_pairs
    )
    assert -1.0 <= r.tau_b <= 1.0


def test_trimmed_mean_bracketing(spark):
    rows = ent.queries()["stats_trimmed_mean"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.lower_bound <= r.upper_bound
        # trimmed and winsorized means live inside the clamp bounds
        assert r.lower_bound <= r.trimmed_mean <= r.upper_bound
        assert r.lower_bound <= r.winsorized_mean <= r.upper_bound
        assert r.n_trimmed_each_side == int(r.n_rows * 0.1)
