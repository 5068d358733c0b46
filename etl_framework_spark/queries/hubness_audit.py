"""Contract keys: ``sales_volume_discount_curve``, ``vec_hubness``,
``llm_lang_coverage``.

Volume-discount curve, vector hubness, and
the language-coverage audit.

Reference parity: the reference's price-structure probe, its
kNN-pathology diagnostic, and its corpus-coverage report —
re-expressed as banded unit-price means, a k-occurrence rollup over
the quantized pair ranking, and per-language concentration
measures.

Scale notes:

- ``sales_volume_discount_curve``: one banded rollup; adjacent-band
  deltas via a window over ≤5 rows.
- ``vec_hubness``: the pair table is the ANN candidate set; the
  k-occurrence histogram is ONE rollup of the per-query top-k.
- ``llm_lang_coverage``: (lang, source) rollup → per-lang HHI.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_framework_spark.catalog import table
from etl_framework_spark.operators.similarity import anchor_knn
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep

_HUB_K = 10


# --------------------------------------------------------------------------
# Volume discount curve: unit price by quantity band
# --------------------------------------------------------------------------
@query(
    "sales_volume_discount_curve",
    oracle="""
    WITH b AS (
      SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS qty_band,
             l_extendedprice / l_quantity AS unit_price,
             l_discount AS disc
      FROM lineitem
    ),
    g AS (
      SELECT qty_band, CAST(count(*) AS BIGINT) AS n,
             avg(unit_price) AS avg_unit_price,
             avg(disc) AS avg_discount
      FROM b GROUP BY qty_band
    )
    SELECT qty_band, n,
           floor(avg_unit_price * 10000 + 0.5) / 10000 AS avg_unit_price,
           floor(avg_discount * 1000000 + 0.5) / 1000000 AS avg_discount,
           floor((avg_unit_price
                  / lag(avg_unit_price) OVER (ORDER BY qty_band) - 1.0)
                 * 1000000 + 0.5) / 1000000 AS unit_price_step
    FROM g ORDER BY qty_band
    """,
)
def sales_volume_discount_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-discount curve: average UNIT price (extendedprice /
    quantity) and average discount by quantity band, with the
    band-over-band unit-price step. A monotone-declining curve =
    genuine volume pricing; a flat curve with rising discount =
    discounts, not price breaks, do the work — two different margin
    levers that aggregate revenue hides. One banded rollup + a
    5-row window. Ref: reference price-structure tests (cf.
    sales_elasticity for the demand response,
    sales_price_dispersion for within-part spread)."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor((F.col("l_quantity") - 1) / 10).cast("bigint").alias("qty_band"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_discount").alias("disc"),
    )
    g = b.groupBy("qty_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("unit_price").alias("avg_unit_price"),
        F.avg("disc").alias("avg_discount"),
    )
    q = lambda c, s: F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)
    step = F.col("avg_unit_price") / F.lag("avg_unit_price").over(
        W.orderBy("qty_band")
    ) - 1.0
    return g.select(
        "qty_band",
        "n",
        q(F.col("avg_unit_price"), 10000.0).alias("avg_unit_price"),
        q(F.col("avg_discount"), 1000000.0).alias("avg_discount"),
        q(step, 1000000.0).alias("unit_price_step"),
    ).orderBy("qty_band")


# --------------------------------------------------------------------------
# Hubness: k-occurrence skew of the embedding kNN graph
# --------------------------------------------------------------------------
@query(
    "vec_hubness",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    anchors AS (SELECT * FROM e WHERE vec_id % 5 = 0),
    pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             floor(list_reduce(
               list_transform(range(1, len(a.v) + 1),
                 k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k])),
               (x, y) -> x + y) * 1000000 + 0.5) * 100000 + b.vec_id
               AS dkey
      FROM anchors a JOIN e b ON a.vec_id <> b.vec_id
    ),
    topk AS (
      SELECT i, dkey % 100000 AS j,
             row_number() OVER (PARTITION BY i ORDER BY dkey) AS rk
      FROM pairs
    ),
    occ AS (
      SELECT j, CAST(count(*) AS DOUBLE) AS k_occ
      FROM topk WHERE rk <= {_HUB_K} GROUP BY j
    ),
    all_occ AS (
      SELECT e.vec_id, coalesce(occ.k_occ, 0.0) AS k_occ
      FROM e LEFT JOIN occ ON e.vec_id = occ.j
    ),
    m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(k_occ) AS mu,
             sum(k_occ * k_occ) AS s2, sum(k_occ * k_occ * k_occ) AS s3,
             max(k_occ) AS mx,
             CAST(sum(CASE WHEN k_occ = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_antihubs
      FROM all_occ
    )
    SELECT CAST(n AS BIGINT) AS n_vecs,
           floor(mu * 10000 + 0.5) / 10000 AS mean_k_occ,
           CAST(mx AS BIGINT) AS max_k_occ,
           n_antihubs,
           floor((s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu)
                 / pow(s2 / n - mu * mu, 1.5) * 10000 + 0.5) / 10000
             AS k_occ_skewness
    FROM m
    """,
)
def vec_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness diagnostic of the embedding kNN graph: the
    k-occurrence distribution (how often each vector appears in
    OTHERS' top-10), its skewness, the worst hub, and the anti-hub
    count (vectors in NOBODY's top-10). High positive skew is the
    classic high-dimensional pathology — a few hubs dominate every
    neighbor list and poison kNN dedup/search; the skewness value
    decides whether to apply local scaling before trusting
    neighbors. k-occurrence is estimated from a deterministic 1-in-5
    anchor sample of QUERY points (the standard hubness estimator
    uses sampled queries; Radovanovic et al.), each scanned exactly
    against the full candidate side: O(M*N) with the anchor count M
    pinned at scale by growing the modulus with N — never O(N^2).
    Oracle samples identically, so parity stays exact. Ref:
    reference kNN-pathology tests (cf. vec_knn_reciprocity — hubs
    are WHY reciprocity fails, vec_two_nn_dim for the
    dimensionality driver)."""
    prep(spark)
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "embedding")
    # anchor matrix collected once (bounded), candidates stream through
    # a slab-fold mapInPandas emitting batch-local top-k per anchor —
    # see operators/similarity.anchor_knn for the bit-parity argument.
    # r8 (VERDICT r7 item 6): the modulus is derived from the corpus
    # size — anchor_modulus() returns 5 at every oracle-checked SF
    # (static `vec_id % 5` oracle stays exact through 500k vectors)
    # and grows with N past that, so the key runs at any scale with a
    # pinned anchor count instead of tripping the collect guard.
    # r9 (ADVICE r8): _locked raises loudly when the modulus leaves
    # the oracle-exact regime unless the rows-only growth env is set.
    from etl_framework_spark.operators.similarity import (
        anchor_modulus_locked,
    )

    mod = anchor_modulus_locked(e.count())
    local = anchor_knn(
        e.repartition(spark.sparkContext.defaultParallelism),
        e.filter(F.col("vec_id") % mod == 0),
        k=_HUB_K,
        quant=1e6,
    )
    topk = local.withColumn(
        "rk", F.row_number().over(W.partitionBy("i").orderBy("qd2", "j"))
    ).filter(F.col("rk") <= _HUB_K)
    occ = topk.groupBy("j").agg(F.count(F.lit(1)).cast("double").alias("k_occ"))
    all_occ = e.select(F.col("vec_id").alias("j")).join(occ, "j", "left").select(
        F.coalesce(F.col("k_occ"), F.lit(0.0)).alias("k_occ")
    )
    m = all_occ.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("k_occ").alias("mu"),
        F.sum(F.col("k_occ") * F.col("k_occ")).alias("s2"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("k_occ")).alias("s3"),
        F.max("k_occ").alias("mx"),
        F.sum(F.when(F.col("k_occ") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_antihubs"),
    )
    skew = (
        F.col("s3") / F.col("n")
        - 3 * F.col("mu") * F.col("s2") / F.col("n")
        + 2 * F.col("mu") * F.col("mu") * F.col("mu")
    ) / F.pow(F.col("s2") / F.col("n") - F.col("mu") * F.col("mu"), 1.5)
    return m.select(
        F.col("n").cast("bigint").alias("n_vecs"),
        (F.floor(F.col("mu") * 10000.0 + 0.5) / 10000.0).alias("mean_k_occ"),
        F.col("mx").cast("bigint").alias("max_k_occ"),
        "n_antihubs",
        (F.floor(skew * 10000.0 + 0.5) / 10000.0).alias("k_occ_skewness"),
    )


# --------------------------------------------------------------------------
# Language coverage audit with source concentration
# --------------------------------------------------------------------------
@query(
    "llm_lang_coverage",
    oracle="""
    WITH d AS (
      SELECT lang, source,
             CAST(count(*) AS DOUBLE) AS docs,
             CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS toks
      FROM documents GROUP BY lang, source
    ),
    lg AS (
      SELECT lang, sum(docs) AS docs, sum(toks) AS toks,
             CAST(count(*) AS BIGINT) AS n_sources,
             sum(toks * toks) AS toks_sq
      FROM d GROUP BY lang
    ),
    tot AS (SELECT sum(toks) AS t FROM lg)
    SELECT lg.lang,
           CAST(lg.docs AS BIGINT) AS n_docs,
           CAST(lg.toks AS BIGINT) AS n_tokens,
           lg.n_sources,
           round(lg.toks / tot.t, 6) AS token_share,
           round(lg.toks_sq / (lg.toks * lg.toks), 6) AS source_hhi
    FROM lg CROSS JOIN tot ORDER BY lg.lang
    """,
)
def llm_lang_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-coverage audit: per language the doc/token counts,
    corpus token share, contributing-source count, and the SOURCE
    HHI within the language (Σ share² — 1.0 means one source is the
    language's sole supplier, the single-point-of-failure a
    multilingual mix must know about). One (lang, source) rollup →
    per-lang aggregation. Integer counts → exact. Ref: reference
    coverage-report tests (cf. llm_lang_id for re-derivation,
    supplier_hhi for the same concentration math on revenue)."""
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    d = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("double").alias("toks"),
    )
    lg = d.groupBy("lang").agg(
        F.sum("docs").alias("docs"),
        F.sum("toks").alias("toks"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum(F.col("toks") * F.col("toks")).alias("toks_sq"),
    )
    tot = lg.agg(F.sum("toks").alias("t"))
    return (
        lg.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("docs").cast("bigint").alias("n_docs"),
            F.col("toks").cast("bigint").alias("n_tokens"),
            "n_sources",
            F.round(F.col("toks") / F.col("t"), 6).alias("token_share"),
            F.round(
                F.col("toks_sq") / (F.col("toks") * F.col("toks")), 6
            ).alias("source_hhi"),
        )
        .orderBy("lang")
    )
