"""Contract keys: ``dp_noisy_counts``, ``dp_contribution_bounded_hist``,
``dp_quantile_release``, ``dp_private_topk``.

Differential-privacy release primitives — the two mechanical pieces a
pipeline needs before publishing aggregate statistics about user-level
data: calibrated Laplace noise on counts, and per-user contribution
bounding (the step that makes a count's sensitivity finite so the
noise scale means anything).

Determinism contract: the Laplace draw uses a SEEDED md5-derived
uniform (same construction as the sketch family's hash rows), so the
release is bit-reproducible and exactly oracle-checkable. A real
production release would swap the seeded uniform for secure
randomness — the mechanism, sensitivity arithmetic, and plumbing are
what these keys pin, not the entropy source; docstrings say so
loudly.

Scale notes:
- ``dp_noisy_counts``: one partial-aggregated count per group, noise
  applied to the 5-row rollup — scalar work after a map-side-combine
  count at any corpus size.
- ``dp_contribution_bounded_hist``: the cap is a per-customer
  row_number over (o_orderdate, o_orderkey) — partitions by the
  natural key, no global sort — then the same partial-agg count.
  The clipped share column reports how much signal the bound costs,
  which is the tuning loop DP practitioners actually run.
- ``dp_quantile_release``: the #below curve for all 64 candidate
  edges comes from one bucketed count + a 64-row running rollup —
  never a per-candidate scan — so the exponential mechanism costs a
  single partial-agg shuffle at any corpus size.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep

_EPS = 1.0        # release epsilon
_CAP_K = 3        # max orders counted per customer (sensitivity bound)
_TWO32 = 4294967296  # 2^32


def _lap_noise_spark(seed_col, b: float):
    """Deterministic Laplace(b) draw from a seeded md5 uniform:
    u = (first-8-hex(md5(seed)) + 0.5) / 2^32 ∈ (0,1), then the
    standard inverse-CDF −b·sign(u−½)·ln(1−2|u−½|). The +0.5 keeps u
    strictly inside (0,1) so the log argument stays positive."""
    u = (
        F.conv(F.substring(F.md5(seed_col), 1, 8), 16, 10).cast("double")
        + 0.5
    ) / F.lit(float(_TWO32))
    centered = u - 0.5
    return (
        -F.lit(b)
        * F.signum(centered)
        * F.log(1 - 2 * F.abs(centered))
    )


def _lap_noise_duck(seed_expr: str, b: float) -> str:
    return (
        f"(-{b} * sign(u.u - 0.5) * ln(1 - 2 * abs(u.u - 0.5)))"
        .replace(
            "u.u",
            f"((('0x' || substr(md5({seed_expr}), 1, 8))::UBIGINT + 0.5)"
            f" / {_TWO32}.0)",
        )
    )


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT c_mktsegment AS segment, count(*) AS n_true
      FROM customer GROUP BY c_mktsegment
    )
    SELECT segment, n_true,
           round(n_true + {_lap_noise_duck("'dp1:' || segment", 1.0 / _EPS)},
                 6) AS n_noisy,
           {_EPS} AS epsilon
    FROM g ORDER BY segment
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP Laplace release of per-segment customer counts
    (sensitivity 1 — each customer contributes to exactly one
    segment, so b = 1/ε). The noise draw is a SEEDED md5-uniform →
    inverse-CDF Laplace, making the release bit-reproducible and the
    key exactly oracle-checkable; a production release would use
    secure randomness in its place — the mechanism and calibration
    are the contract here. True counts are included alongside the
    noisy ones because this key is a verification report, not the
    public artifact. Ref: Dwork et al., 'Calibrating Noise to
    Sensitivity in Private Data Analysis' (TCC'06)."""
    prep(spark)
    cust = table(spark, sf_dir, "customer")
    g = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_true")
    )
    noise = _lap_noise_spark(
        F.concat(F.lit("dp1:"), F.col("segment")), 1.0 / _EPS
    )
    return g.select(
        "segment",
        "n_true",
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
        F.lit(_EPS).alias("epsilon"),
    ).orderBy("segment")


@query(
    "dp_contribution_bounded_hist",
    oracle=f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS rk
      FROM orders
    ),
    raw AS (
      SELECT o_orderpriority AS priority, count(*) AS n_raw
      FROM orders GROUP BY o_orderpriority
    ),
    bounded AS (
      SELECT o_orderpriority AS priority, count(*) AS n_bounded
      FROM ranked WHERE rk <= {_CAP_K} GROUP BY o_orderpriority
    )
    SELECT raw.priority, raw.n_raw, bounded.n_bounded,
           round(1.0 - CAST(bounded.n_bounded AS DOUBLE) / raw.n_raw, 6)
             AS clipped_share,
           round(bounded.n_bounded
                 + {_lap_noise_duck("'dp2:' || raw.priority", _CAP_K / _EPS)},
                 6) AS n_noisy,
           {float(_CAP_K)} AS sensitivity
    FROM raw JOIN bounded ON raw.priority = bounded.priority
    ORDER BY raw.priority
    """,
)
def dp_contribution_bounded_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contribution-bounded DP histogram: each customer's orders are
    capped at K=3 (earliest by (o_orderdate, o_orderkey) — a
    deterministic, join-free per-user sample) BEFORE counting per
    priority, which bounds the count's user-level sensitivity at K so
    Laplace(K/ε) noise actually delivers ε-DP; unbounded counts have
    unbounded user sensitivity and no noise scale fixes that. Reports
    the raw count, the bounded count, the clipped share (the
    utility-vs-privacy tuning signal), and the seeded-noise release.
    The cap is a row_number over the customer partition — shuffles by
    the natural key, never sorts globally. Ref: user-level DP
    contribution bounding (Dwork & Roth, 'Algorithmic Foundations of
    DP', §.3; Wilson et al., 'Differentially Private SQL' VLDB'20)."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    rk = F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    ranked = orders.select(
        F.col("o_orderpriority").alias("priority"), rk.alias("rk")
    )
    raw = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_raw")
    )
    bounded = (
        ranked.filter(F.col("rk") <= _CAP_K)
        .groupBy("priority")
        .agg(F.count("*").alias("n_bounded"))
    )
    noise = _lap_noise_spark(
        F.concat(F.lit("dp2:"), F.col("priority")), _CAP_K / _EPS
    )
    return (
        raw.join(bounded, "priority")
        .select(
            "priority",
            "n_raw",
            "n_bounded",
            F.round(
                1.0 - F.col("n_bounded").cast("double") / F.col("n_raw"), 6
            ).alias("clipped_share"),
            F.round(F.col("n_bounded") + noise, 6).alias("n_noisy"),
            F.lit(float(_CAP_K)).alias("sensitivity"),
        )
        .orderBy("priority")
    )


_Q_BIN = 8000          # candidate edge spacing for the quantile release
_Q_NBINS = 64          # candidates cover [8000, 512000] ⊇ o_totalprice
_Q_EPS = 1.0


@query(
    "dp_quantile_release",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(least(floor(o_totalprice / {_Q_BIN}),
                        {_Q_NBINS - 1}) AS BIGINT) AS b,
             count(*) AS c
      FROM orders GROUP BY 1
    ),
    cands AS (SELECT unnest(generate_series(1, {_Q_NBINS})) AS i),
    below AS (
      SELECT i, CAST(i * {_Q_BIN} AS BIGINT) AS edge,
             coalesce((SELECT sum(c) FROM binned WHERE b < i), 0) AS n_below
      FROM cands
    ),
    tot AS (SELECT count(*) AS n,
                   round(median(o_totalprice), 6) AS true_median
            FROM orders),
    scored AS (
      SELECT i, edge, n_below,
             -abs(n_below - n / 2.0) * {_Q_EPS} / 2.0
             + (-ln(-ln((('0x' || substr(md5('dpq:' || i), 1, 8))::UBIGINT
                          + 0.5) / {_TWO32}.0))) AS score,
             n, true_median
      FROM below CROSS JOIN tot
    )
    SELECT CAST(edge AS BIGINT) AS released_edge,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(n_below - n / 2.0 AS DOUBLE) AS rank_err,
           true_median, {_Q_EPS} AS epsilon
    FROM scored
    ORDER BY score DESC, i LIMIT 1
    """,
)
def dp_quantile_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP median release via the EXPONENTIAL MECHANISM (McSherry &
    Talwar FOCS'07) with the Gumbel-max implementation: candidates
    are the 64 fixed bin edges i·8000, utility is −|#below(edge) −
    n/2| (sensitivity 1 per user), and the mechanism's softmax draw
    is realized as argmax(ε·u/2 + Gumbel) with a SEEDED md5-Gumbel —
    bit-reproducible, exactly oracle-checked; swap secure randomness
    in for a real release. The #below curve for ALL candidates comes
    from one bucketed count + a 64-row running sum — never a
    per-candidate scan — so the mechanism costs one partial-agg
    shuffle at any corpus size. Reports the released edge, its rank
    error, and the true median for the utility readout."""
    prep(spark)
    orders = table(spark, sf_dir, "orders")
    binned = orders.groupBy(
        F.least(
            F.floor(F.col("o_totalprice") / _Q_BIN), F.lit(_Q_NBINS - 1)
        )
        .cast("bigint")
        .alias("b")
    ).agg(F.count("*").alias("c"))
    cands = spark.range(1, _Q_NBINS + 1).select(F.col("id").alias("i"))
    below = (
        cands.join(F.broadcast(binned), F.col("b") < F.col("i"), "left")
        .groupBy("i")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_below"))
        .select("i", (F.col("i") * _Q_BIN).cast("bigint").alias("edge"), "n_below")
    )
    tot = orders.agg(
        F.count("*").alias("n"),
        F.round(F.percentile("o_totalprice", 0.5), 6).alias("true_median"),
    )
    u_gum = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dpq:"), F.col("i"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(_TWO32))
    score = (
        -F.abs(F.col("n_below") - F.col("n") / 2.0) * _Q_EPS / 2.0
        + (-F.log(-F.log(u_gum)))
    )
    scored = below.crossJoin(F.broadcast(tot)).select(
        "i",
        "edge",
        "n_below",
        "n",
        "true_median",
        score.alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), "i")
        .limit(1)
        .select(
            F.col("edge").alias("released_edge"),
            F.col("n_below").cast("bigint").alias("n_below"),
            (F.col("n_below") - F.col("n") / 2.0)
            .cast("double")
            .alias("rank_err"),
            "true_median",
            F.lit(_Q_EPS).alias("epsilon"),
        )
    )


_TOPK_K = 5
_TOPK_EPS = 1.0
_TOPK_COEF = _TOPK_EPS / (2 * _TOPK_K)  # per-pick budget eps/k, sens 1


def _topk_oracle() -> str:
    gum = (
        "(-ln(-ln(((('0x' || substr(md5('dpk:' || {step} || ':' || b), 1, 8))"
        f"::UBIGINT + 0.5) / {_TWO32}.0))))"
    )
    peels = []
    for t in range(1, _TOPK_K + 1):
        excl = (
            ""
            if t == 1
            else "AND b NOT IN ("
            + " UNION ALL ".join(f"SELECT b FROM p{j}" for j in range(1, t))
            + ")"
        )
        peels.append(
            f"p{t} AS (SELECT b, c FROM cand "
            f"WHERE TRUE {excl} "
            f"ORDER BY {_TOPK_COEF} * c + {gum.format(step=t)} DESC, b "
            f"LIMIT 1)"
        )
    picks = " UNION ALL ".join(
        f"SELECT {t} AS pick, b, c FROM p{t}" for t in range(1, _TOPK_K + 1)
    )
    return f"""
    WITH cand AS (
      SELECT p_brand AS b, count(*) AS c
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1
    ),
    {', '.join(peels)},
    ranked AS (
      SELECT b, row_number() OVER (ORDER BY c DESC, b) AS true_rank
      FROM cand
    ),
    picked AS ({picks})
    SELECT picked.pick, picked.b AS brand,
           CAST(picked.c AS BIGINT) AS true_count,
           CAST(ranked.true_rank AS INT) AS true_rank
    FROM picked JOIN ranked ON picked.b = ranked.b
    ORDER BY picked.pick
    """


@query("dp_private_topk", oracle=_topk_oracle())
def dp_private_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP top-k selection by PEELING the exponential mechanism
    (Durfee & Rogers NeurIPS'19 shape): five sequential picks, each an
    argmax of ε/(2k)·count + seeded Gumbel over the not-yet-picked
    brands — per-pick budget ε/k composes to ε overall, sensitivity 1
    per lineitem. The peels are UNROLLED into one declarative plan
    (five 25-row argmax frames chained by anti-joins — no driver
    loop, no collect), and the seeded md5-Gumbel makes the release
    bit-reproducible and exactly oracle-checked; the true_rank column
    reports which picks deviate from the exact top-5, the utility
    readout DP evaluations plot. Completes the DP family: counts →
    bounded histograms → quantiles → top-k selection. Ref: reference
    private-release tests (cf. dp_quantile_release — same Gumbel-max
    machinery, one pick vs k composed picks)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    cand = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    # r11 optimization: the peel runs over a BOUNDED frame (|brands| =
    # 25 at every scale factor — the brand domain, not the data, sets
    # it), so the five sequential argmax sub-plans (each its own
    # TakeOrderedAndProject chain over a ReusedExchange, ~15 stages
    # end to end, measured 3.2-5.0 s at sf0.1) collapse into ONE row:
    # collect_list the 25 (b, c) pairs after the count rollup, then
    # peel all five picks with array expressions inside a single
    # projection — argmax via F.aggregate (strictly-greater-or-tie-on-
    # smaller-b scan ≡ orderBy(score DESC, b).limit(1)), exclusion via
    # F.filter, true_rank via the count of (c, b)-lexicographically
    # not-after elements ≡ row_number over (c DESC, b). Same picks,
    # same columns, exactly the oracle's semantics — measured 3.2 s →
    # ~0.5 s (plan: 5 argmax frames + window + join → 2 exchanges +
    # one single-row projection).

    def score(step: int):
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"dpk:{step}:"), F.col("b"))), 1, 8
                ),
                16,
                10,
            ).cast("double")
            + 0.5
        ) / F.lit(float(_TWO32))
        return _TOPK_COEF * F.col("c") + (-F.log(-F.log(u)))

    # per-brand scores for all five steps computed ONCE on the 25-row
    # frame; the fold below then only compares precomputed doubles, so
    # the whole peel is one constant-size expression (a naive unrolled
    # chain re-embeds the remaining-set subtree per pick — measured
    # 24 s of py4j expression construction and a 656 KB plan).
    one = (
        cand.select(
            F.struct(
                "b",
                "c",
                F.array(
                    *[score(t) for t in range(1, _TOPK_K + 1)]
                ).alias("ss"),
            ).alias("e")
        ).agg(F.collect_list("e").alias("arr"))
    )

    def best(rem, t):
        # argmax by (score_t DESC, b ASC) ≡ orderBy(score_t.desc(), "b").limit(1)
        def m(acc, x):
            sx, sa = F.element_at(x["ss"], t), F.element_at(acc["ss"], t)
            return F.when(
                (sx > sa) | ((sx == sa) & (x["b"] < acc["b"])), x
            ).otherwise(acc)

        return F.aggregate(rem, F.element_at(rem, F.lit(1)), m)

    empty_picks = F.expr(
        "CAST(array() AS "
        "array<struct<pick:int,brand:string,true_count:bigint,true_rank:int>>)"
    )

    def step(acc, t):
        p = best(acc["rem"], t)
        # row_number over (c DESC, b) ≡ count of (c, b)-not-after rows
        true_rank = F.size(
            F.filter(
                F.col("arr"),
                lambda y: (y["c"] > p["c"])
                | ((y["c"] == p["c"]) & (y["b"] <= p["b"])),
            )
        )
        return F.struct(
            F.filter(acc["rem"], lambda x: x["b"] != p["b"]).alias("rem"),
            F.concat(
                acc["picks"],
                F.array(
                    F.struct(
                        t.cast("int").alias("pick"),
                        p["b"].alias("brand"),
                        p["c"].cast("bigint").alias("true_count"),
                        true_rank.cast("int").alias("true_rank"),
                    )
                ),
            ).alias("picks"),
        )

    res = F.aggregate(
        F.sequence(F.lit(1), F.lit(_TOPK_K)),
        F.struct(F.col("arr").alias("rem"), empty_picks.alias("picks")),
        step,
    )
    return (
        one.select(F.explode(res["picks"]).alias("p"))
        .select("p.pick", "p.brand", "p.true_count", "p.true_rank")
        .orderBy("pick")
    )
