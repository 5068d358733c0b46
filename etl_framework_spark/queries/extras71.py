"""Round-5 batch 71: forecast calibration, tail risk, and k-core
peeling.

Reference parity: the reference's probabilistic-eval metrics, its
VaR/CVaR risk rollup, and its graph-core decomposition — re-
expressed as point-in-time rate predictions scored in one pass,
grouped quantile + conditional mean, and unrolled degree peels.

Scale notes:

- ``stats_brier_calibration``: the predictor is each user's PRIOR
  purchase share (a PIT window — leakage-free by frame), so
  prediction + scoring happen in ONE window pass + one rollup;
  p̂ is a ratio of integer counts → exact binning on both engines.
- ``stats_var_cvar``: one grouped quantile, broadcast back for the
  conditional tail mean — two small shuffles total.
- ``graph_kcore_peel``: true k-core iterates to a fixpoint; three
  UNROLLED peel rounds approximate it with a STATIC plan (each
  round = one degree rollup + one semi-join). The remaining-node
  curve converging is the signal; at 100 TB rounds are cheap
  because the edge set only shrinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep

_NBINS = 5
_KCORE = 6
_PEELS = 3


# --------------------------------------------------------------------------
# Brier score + reliability bins for a PIT base-rate predictor
# --------------------------------------------------------------------------
@query(
    "stats_brier_calibration",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
             CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS t,
             event_id
      FROM events
    ),
    p AS (
      SELECT y,
             sum(y) OVER w / count(*) OVER w AS phat
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT y, phat,
             least(CAST(floor(phat * {_NBINS}) AS BIGINT), {_NBINS - 1})
               AS bin
      FROM p WHERE phat IS NOT NULL
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(phat), 6) AS mean_predicted,
           round(avg(y), 6) AS mean_observed,
           round(avg((phat - y) * (phat - y)), 6) AS brier_in_bin
    FROM scored GROUP BY bin
    """,
)
def stats_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic-forecast calibration of the simplest honest
    predictor — each user's PRIOR purchase share (point-in-time
    window, so the prediction never sees its own label): per
    reliability bin, the mean predicted probability vs the observed
    purchase rate, plus the in-bin Brier score. Well-calibrated means
    the two columns track; the gap IS the calibration error. p̂ is a
    ratio of window integer counts → exact, so binning agrees across
    engines with no float ceremony. Ref: reference forecast-eval
    tests (cf. feat_pit_training_set, events_forecast_backtest)."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("t"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    p = seq.select(
        "y",
        (F.sum("y").over(w) / F.count(F.lit(1)).over(w)).alias("phat"),
    ).filter(F.col("phat").isNotNull())
    scored = p.withColumn(
        "bin",
        F.least(
            F.floor(F.col("phat") * _NBINS).cast("bigint"),
            F.lit(_NBINS - 1).cast("bigint"),
        ),
    )
    return scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("phat"), 6).alias("mean_predicted"),
        F.round(F.avg("y"), 6).alias("mean_observed"),
        F.round(
            F.avg((F.col("phat") - F.col("y")) * (F.col("phat") - F.col("y"))), 6
        ).alias("brier_in_bin"),
    )


# --------------------------------------------------------------------------
# Value-at-Risk and Conditional VaR of event values per type
# --------------------------------------------------------------------------
@query(
    "stats_var_cvar",
    oracle="""
    WITH q AS (
      SELECT event_type, quantile_cont(value, 0.05) AS var05
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(max(q.var05), 6) AS var_5pct,
           round(avg(CASE WHEN e.value <= q.var05 THEN e.value END), 6)
             AS cvar_5pct,
           CAST(count(*) FILTER (e.value <= q.var05) AS BIGINT)
             AS n_tail
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def stats_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Conditional VaR (expected shortfall) of
    event values per type: the 5th-percentile value and the mean of
    everything at or below it — CVaR is the coherent risk measure
    regulators insist on precisely because VaR alone ignores HOW BAD
    the tail is. One grouped exact quantile, broadcast back for the
    conditional tail mean — two small shuffles. Ref: reference
    risk-rollup tests (cf. stats_hill_tail for the tail-shape
    twin)."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("var05")
    )
    j = ev.join(F.broadcast(q), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("var05"), 6).alias("var_5pct"),
        F.round(
            F.avg(F.when(F.col("value") <= F.col("var05"), F.col("value"))), 6
        ).alias("cvar_5pct"),
        F.count(F.when(F.col("value") <= F.col("var05"), 1))
        .cast("bigint")
        .alias("n_tail"),
    )


# --------------------------------------------------------------------------
# k-core peeling (3 unrolled rounds) of the co-supplier graph
# --------------------------------------------------------------------------
def _peel_sql() -> str:
    # MATERIALIZED hints: every CTE here is referenced several times
    # downstream; without them DuckDB inlines the whole part-pair
    # self-join once PER REFERENCE (measured ~50s vs <1s).
    sql = """
    WITH e0raw AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
                                       l_suppkey AS s
                   FROM lineitem),
    w0 AS MATERIALIZED (
      SELECT a.s AS u, b.s AS v, CAST(count(*) AS DOUBLE) AS c
      FROM e0raw a JOIN e0raw b ON a.p = b.p AND a.s < b.s
      GROUP BY u, v
    ),
    thr AS (SELECT quantile_cont(c, 0.9) AS t FROM w0),
    e0 AS MATERIALIZED (SELECT u, v FROM w0, thr WHERE c > t)"""
    prev = "e0"
    for r in range(1, _PEELS + 1):
        sql += f""",
    d{r} AS MATERIALIZED (
      SELECT n FROM (
        SELECT n, count(*) AS d FROM (
          SELECT u AS n FROM {prev} UNION ALL SELECT v AS n FROM {prev}
        ) GROUP BY n
      ) WHERE d >= {_KCORE}
    ),
    e{r} AS MATERIALIZED (
      SELECT u, v FROM {prev}
      WHERE u IN (SELECT n FROM d{r}) AND v IN (SELECT n FROM d{r})
    )"""
        prev = f"e{r}"
    parts = []
    for r in range(_PEELS + 1):
        parts.append(
            f"""
    SELECT {r} AS round,
           (SELECT CAST(count(DISTINCT n) AS BIGINT) FROM
             (SELECT u AS n FROM e{r} UNION ALL SELECT v AS n FROM e{r}))
             AS nodes_remaining,
           (SELECT CAST(count(*) AS BIGINT) FROM e{r}) AS edges_remaining"""
        )
    return sql + " " + " UNION ALL ".join(parts)


@query("graph_kcore_peel", oracle=_peel_sql())
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled rounds of k-core peeling (k=6) on the
    top-decile co-supplier graph: each round drops nodes of degree
    < k and their incident edges — the remaining-node curve flattens
    exactly when the true 6-core is reached, and 'how fast it
    flattens' is the robustness signature. Unrolling keeps the plan
    STATIC (degree rollup + semi-join per round) and each round's
    input only shrinks — the honest distributed approximation of the
    sequential peel. Ref: reference core-decomposition tests (cf.
    graph_khop_reach, graph_assortativity)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    e0raw = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    a = e0raw.select("p", F.col("s").alias("u"))
    b = e0raw.select("p", F.col("s").alias("v"))
    w0 = (
        a.join(b, "p")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .persist()
    )
    thr = w0.agg(F.percentile("c", 0.9).alias("t"))
    # persist the (tiny, post-threshold) edge sets: every peel round
    # and every per-round count re-reads them, and without a cache the
    # whole part-pair self-join would replay once per reference
    # coalesce(1): the post-threshold edge set is a few hundred rows —
    # single-partition rounds avoid 32-task scheduling overhead per peel
    edges = (
        w0.crossJoin(F.broadcast(thr))
        .filter(F.col("c") > F.col("t"))
        .select("u", "v")
        .coalesce(1)
        .persist()
    )
    rounds = [edges]
    cur = edges
    for _ in range(_PEELS):
        deg = (
            cur.select(F.col("u").alias("n"))
            .unionAll(cur.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE)
            .select("n")
        )
        cur = (
            cur.join(
                F.broadcast(deg.select(F.col("n").alias("u"))), "u", "left_semi"
            )
            .join(
                F.broadcast(deg.select(F.col("n").alias("v"))), "v", "left_semi"
            )
            .select("u", "v")
            .persist()
        )
        rounds.append(cur)
    for e in rounds:
        e.count()  # seal each tiny cache before the fan-out below
    outs = []
    for r, e in enumerate(rounds):
        un = e.select(F.col("u").alias("n")).unionAll(
            e.select(F.col("v").alias("n"))
        )
        outs.append(
            un.agg(
                F.countDistinct("n").cast("bigint").alias("nodes_remaining"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("edges_remaining"),
            ).select(
                F.lit(r).alias("round"), "nodes_remaining", "edges_remaining"
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionAll(df)
    return out
