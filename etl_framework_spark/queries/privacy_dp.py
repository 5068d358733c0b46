"""Contract keys: ``dp_noisy_counts``, ``dp_contribution_bounded_hist``.

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
