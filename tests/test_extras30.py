"""Invariant tests for the round-3 batch 14 operators (extras30)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_srm_clean_on_hash_split(spark):
    (r,) = _rows(spark, "events_ab_srm")
    users = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n0 + r.n1 == users  # SRM counts the randomization unit
    assert r.chi2 >= 0.0
    # a correct hash split must NOT trip the guardrail
    assert not r.srm_detected


def test_cms_error_shrinks_with_width(spark):
    rows = sorted(_rows(spark, "sketch_cms_width_sweep"),
                  key=lambda r: r.width)
    assert [r.width for r in rows] == [16, 32, 64, 128]
    for r in rows:
        assert r.n_probes == 20
        assert 0 <= r.mean_overestimate
        assert r.max_overestimate >= 0
    # CMS bound ~N/w: mean error must not INCREASE as width doubles
    means = [r.mean_overestimate for r in rows]
    assert all(hi <= lo for lo, hi in zip(means, means[1:]))
