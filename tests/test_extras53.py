"""Invariant tests for batch 53 (geo grid join, Q-Q, weighted sample)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_geo_grid_matches_naive_on_sample(spark):
    df = ent.queries()["join_geo_grid"](spark, SF_SMALL)
    rows = df.collect()
    # symmetric dedup: every pair once, ordered ids
    for r in rows:
        assert r.cust_a < r.cust_b
        assert 0.0 <= r.dist_km <= 200.0
    # no duplicate pairs from the 9-cell explode
    pairs = [(r.cust_a, r.cust_b) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_geo_grid_distance_formula(spark):
    rows = ent.queries()["join_geo_grid"](spark, SF_SMALL).collect()
    if not rows:
        return
    r = rows[0]

    def coord(k):
        return ((k * 37) % 1200) / 10.0 - 60.0, ((k * 101) % 3400) / 10.0 - 170.0

    lata, lona = coord(r.cust_a)
    latb, lonb = coord(r.cust_b)
    dlat = math.radians(latb - lata) / 2
    dlon = math.radians(lonb - lona) / 2
    hav = 12742.0 * math.asin(
        math.sqrt(
            math.sin(dlat) ** 2
            + math.cos(math.radians(lata))
            * math.cos(math.radians(latb))
            * math.sin(dlon) ** 2
        )
    )
    assert abs(hav - r.dist_km) < 1e-4


def test_qq_deciles_monotone(spark):
    rows = sorted(
        ent.queries()["stats_qq_compare"](spark, SF_SMALL).collect(),
        key=lambda r: r.p,
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        # quantile functions are non-decreasing
        assert a.q_even <= b.q_even
        assert a.q_odd <= b.q_odd
    for r in rows:
        assert abs(r.qq_diff - (r.q_even - r.q_odd)) < 1e-4
        assert r.qq_ratio > 0


def test_weighted_sample_determinism_and_bias(spark):
    q = ent.queries()["mix_weighted_sample"]
    a = q(spark, SF_SMALL).collect()
    b = q(spark, SF_SMALL).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # reproducible
    assert len(a) <= 100
    ranks = sorted(r.rk for r in a)
    assert ranks == list(range(1, len(a) + 1))
    # keys descend with rank; all in (0, 1]
    by_rank = sorted(a, key=lambda r: r.rk)
    for x, y in zip(by_rank, by_rank[1:]):
        assert x.sample_key >= y.sample_key
    assert all(0.0 < r.sample_key <= 1.0 for r in a)
