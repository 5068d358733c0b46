"""Invariant tests for batch 78 (type co-occurrence, checksums, conformal)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_type_cooccurrence_lift_positive(spark):
    rows = ent.queries()["events_type_cooccurrence"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.t1 < r.t2
        assert r.n_cobaskets >= 1
        assert r.lift > 0


def test_partition_checksums_stable_and_distinct(spark):
    q = ent.queries()["dq_partition_checksum"]
    a = {r.day: r for r in q(spark, SF_SMALL).collect()}
    b = {r.day: r for r in q(spark, SF_SMALL).collect()}
    assert a.keys() == b.keys()
    for d in a:
        # reproducible across runs (commutative sum mod p)
        assert a[d].checksum == b[d].checksum
        assert a[d].n_rows == b[d].n_rows
        assert 0 <= a[d].checksum < 1000000007
        assert a[d].min_hash <= a[d].max_hash
    # different days virtually never share a checksum
    sums = [r.checksum for r in a.values()]
    assert len(set(sums)) == len(sums)


def test_conformal_coverage_near_target(spark):
    rows = ent.queries()["stats_conformal_interval"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_calib > 0 and r.n_holdout > 0
        assert r.half_width > 0
        # distribution-free guarantee: coverage ≈ 90% (slack for
        # small holdouts and drift between halves)
        assert 0.75 <= r.holdout_coverage <= 1.0
