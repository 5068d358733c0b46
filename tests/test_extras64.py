"""Invariant tests for batch 64 (ntile/cume_dist, median shards, truncation)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ntile_buckets_balanced_and_ordered(spark):
    rows = ent.queries()["win_ntile_cume"](spark, SF_SMALL).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.o_orderstatus, []).append(r)
    for st, rs in by_status.items():
        rs.sort(key=lambda r: r.decile)
        assert [r.decile for r in rs] == list(range(1, 11))
        # SQL ntile: bucket sizes differ by at most 1, remainder early
        sizes = [r.n_rows for r in rs]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        # deciles tile the price axis in order
        for a, b in zip(rs, rs[1:]):
            assert a.min_price <= b.min_price
        assert abs(rs[-1].max_cume_dist - 1.0) < 1e-9


def test_median_of_medians_is_biased_but_close(spark):
    rows = ent.queries()["agg_median_shards"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_shards == 8
        assert r.abs_err >= 0.0
        # the two estimates agree to within a few percent on smooth data
        assert r.rel_err < 0.10
        assert abs(r.abs_err - abs(r.mom_median - r.exact_median)) < 1e-3


def test_truncation_loss_monotone_in_window(spark):
    rows = sorted(
        ent.queries()["train_truncation_loss"](spark, SF_SMALL).collect(),
        key=lambda r: r.window_tokens,
    )
    assert [r.window_tokens for r in rows] == [128, 256, 512]
    for a, b in zip(rows, rows[1:]):
        # a bigger window can only truncate less
        assert a.n_truncated >= b.n_truncated
        assert a.tokens_lost >= b.tokens_lost
    for r in rows:
        assert 0.0 <= r.docs_truncated_share <= 1.0
        assert 0.0 <= r.tokens_lost_share < 1.0
