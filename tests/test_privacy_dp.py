"""DP release keys (queries/privacy_dp.py).

The oracle sweep pins exact values; these tests pin the MECHANISM
claims: calibration of the seeded Laplace draw, sensitivity bounding,
and bit-reproducibility of the release.
"""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_noisy_counts_reproducible_and_calibrated(spark):
    q = ent.queries()["dp_noisy_counts"]
    a = {(r.segment, r.n_noisy) for r in q(spark, SF_SMALL).collect()}
    b = {(r.segment, r.n_noisy) for r in q(spark, SF_SMALL).collect()}
    assert a == b  # seeded draw: the release is bit-reproducible
    rows = q(spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        noise = r.n_noisy - r.n_true
        # Laplace(b=1) tail: P(|noise| > 20) = e^-20 ≈ 2e-9 — a draw
        # outside that betrays a broken inverse-CDF, not bad luck
        assert abs(noise) < 20, r
        assert noise != 0  # u is never exactly 0.5 by construction
        assert r.epsilon == 1.0


def test_contribution_bound_dominates_and_clips(spark):
    rows = ent.queries()["dp_contribution_bounded_hist"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) == 5
    assert any(r.clipped_share > 0 for r in rows)  # the cap must bite
    for r in rows:
        assert 0 <= r.n_bounded <= r.n_raw
        assert 0.0 <= r.clipped_share < 1.0
        assert r.sensitivity == 3.0
        # Laplace(b=3) tail at 60 = e^-20
        assert abs(r.n_noisy - r.n_bounded) < 60


def test_laplace_inverse_cdf_formula():
    """The closed form both engines fold: u→−b·sign(u−½)·ln(1−2|u−½|)
    must invert the Laplace CDF (plain-Python check, no Spark)."""
    b = 2.0
    for u in (0.01, 0.25, 0.5 + 2**-33, 0.75, 0.99):
        x = -b * math.copysign(1, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        # CDF of Laplace(0, b) at x must give back u
        cdf = 0.5 + 0.5 * math.copysign(1, x) * (1 - math.exp(-abs(x) / b))
        assert math.isclose(cdf, u, rel_tol=1e-9), (u, x, cdf)


def test_quantile_release_utility_and_reproducibility(spark):
    q = ent.queries()["dp_quantile_release"]
    r1 = q(spark, SF_SMALL).collect()[0]
    r2 = q(spark, SF_SMALL).collect()[0]
    assert r1 == r2  # seeded Gumbel: reproducible
    assert r1.released_edge % 8000 == 0
    # exponential-mechanism utility bound: P(rank err > (2/eps)(ln K + t))
    # <= e^-t; with K=64 candidates and eps=1, err > 2*(ln 64 + 20) ~ 48
    # would betray a broken score, not bad luck
    assert abs(r1.rank_err) < 50, r1
    # the released edge should bracket the true median within one bin
    # of the best candidate (utility is within the same bound)
    assert abs(r1.released_edge - r1.true_median) < 8000 + 50 * 8000 / 250


def test_ams_f2_estimator_quality(spark):
    """AMS median-of-means with 16 groups x 16 counters: relative
    error concentrates well under 50%; exact_f2 must equal the
    directly-computed sum of squared part degrees. (Lives here with
    the other mechanism tests; the key itself is in the sketch
    family.)"""
    from pyspark.sql import functions as F

    from etl_framework_spark.catalog import table

    row = ent.queries()["sketch_ams_f2"](spark, SF_SMALL).collect()[0]
    li = table(spark, SF_SMALL, "lineitem")
    f2 = (
        li.groupBy("l_partkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    assert row.exact_f2 == f2
    assert row.rel_err < 0.5, row
    assert row.ams_est > 0


def test_kmv_estimator_exact_below_capacity_and_bounded_above(spark):
    """KMV with k=256: exact when distinct < k (sf0.001 has 150
    customers with orders), and within the ~3/sqrt(k) concentration
    envelope above capacity."""
    row = ent.queries()["sketch_kmv_distinct"](spark, SF_SMALL).collect()[0]
    assert row.exact_distinct == 150
    assert row.kmv_est == 150.0 and row.rel_err == 0.0
    big = ent.queries()["sketch_kmv_distinct"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert big.exact_distinct == 1500
    assert 0 < big.rel_err < 3 / (256 ** 0.5), big


def test_kmv_windowed_merge_properties(spark):
    """Windowed KMV: one row per day, the estimator branch engages on
    saturated windows (exact > k=32), the ramp-up edge differs from
    the steady state (proving the merge actually windows), and every
    estimate stays within the k=32 concentration envelope."""
    rows = ent.queries()["sketch_kmv_windowed"](spark, SF_SMALL).collect()
    assert len(rows) == 30
    assert rows[0].exact_users <= rows[6].exact_users  # ramp-up edge
    for r in rows:
        if r.exact_users > 32:
            assert r.rel_err < 3 / (32 ** 0.5), r  # ~53% cap, 3-sigma-ish
        else:
            assert r.rel_err == 0.0, r  # below capacity = exact


def test_kmv_jaccard_estimator(spark):
    """KMV set-comparison: the estimate must sit inside the binomial
    concentration envelope around the exact Jaccard (k=32 → sigma
    ~= sqrt(j(1-j)/32) ~= 0.09 at j~0.5; 4 sigma = 0.36), and the
    populations must be genuinely different (the first fixture choice
    had every user in both sets — jac 1.0 — which tests nothing)."""
    r = ent.queries()["sketch_kmv_jaccard"](spark, SF_SMALL).collect()[0]
    assert 0.3 < r.exact_jac < 0.7, r  # non-degenerate by construction
    assert r.abs_err <= 4 * (0.25 / 32) ** 0.5, r
    assert r.n_1995 > r.n_2001  # 2001 is a partial year


def test_mm_byte_histogram_neardup_properties(spark):
    """Codec-free multimodal near-dup: symmetric-free pair list
    (id_a < id_b), distances within [0, tau], and the fingerprint is
    invariant to byte ORDER (a shuffled payload has the identical
    histogram — the property that makes it a distribution
    fingerprint, not a digest)."""
    rows = ent.queries()["mm_byte_histogram_neardup"](
        spark, SF_SMALL
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.id_a < r.id_b
        assert 0.0 <= r.l1_dist <= 0.05
    # order-invariance of the nibble histogram, in plain Python
    import collections
    a = "hello world payload".encode().hex().upper()
    b = "".join(sorted(a))
    assert collections.Counter(a) == collections.Counter(b)



def test_private_topk_reproducible_and_useful(spark):
    """Peeled exponential mechanism: 5 distinct picks, reproducible
    (seeded Gumbel), and with eps/k budget per pick the picks stay
    within the near-top of the true ranking (the score margin beats
    Gumbel noise for all but neighboring counts — at SF_SMALL the
    observed deviation is pick 5 taking true rank 6)."""
    q = ent.queries()["dp_private_topk"]
    rows = q(spark, SF_SMALL).collect()
    assert [r.pick for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.brand for r in rows}) == 5  # peeling never repeats
    assert rows == q(spark, SF_SMALL).collect()
    for r in rows:
        assert r.true_rank <= 10, r  # never a deep-tail pick at eps=1
