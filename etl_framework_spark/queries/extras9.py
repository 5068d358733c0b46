"""Round-2 batch 4: evaluation/reporting composites — language-ID
confusion matrix and near-dup cluster profile. Both reuse the exact
machinery of their base operators (llm_lang_id, llm_dedup_minhash) so
the oracles stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_framework_spark.queries.llm import (
    _DUCK_TOKS,
    _duck_lang_score,
    _duck_minhash_cte,
    llm_dedup_minhash,
    llm_lang_id,
)
from etl_framework_spark.registry import query
from etl_framework_spark.session import prep


@query(
    "llm_langid_confusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_DUCK_TOKS} AS l FROM documents),
    s AS (SELECT doc_id, lang,
                 {_duck_lang_score("en")} AS s_en,
                 {_duck_lang_score("es")} AS s_es,
                 {_duck_lang_score("de")} AS s_de,
                 {_duck_lang_score("fr")} AS s_fr
          FROM t),
    pred AS (
      SELECT lang AS meta_lang,
             CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0
                    THEN 'en'
                  WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
                  WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
                  WHEN s_fr > 0 THEN 'fr'
                  ELSE 'und' END AS pred_lang
      FROM s)
    SELECT meta_lang, pred_lang, count(*) AS n
    FROM pred GROUP BY meta_lang, pred_lang
    """,
)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation composite: the llm_lang_id predictions
    grouped into a (true lang × predicted lang) confusion matrix —
    the report a corpus pipeline publishes to monitor its language
    gates. Reuses the exact lang-ID operator, then one tiny agg."""
    prep(spark)
    pred = llm_lang_id(spark, sf_dir)
    return pred.groupBy("meta_lang", "pred_lang").agg(F.count("*").alias("n"))


@query(
    "llm_dedup_cluster_profile",
    oracle=_duck_minhash_cte()
    + """,
    bmins AS (SELECT band, bkey, min(doc_id) AS bmin FROM bands GROUP BY 1, 2),
    clusters AS (SELECT b.doc_id, min(m.bmin) AS cluster_id
                 FROM bands b JOIN bmins m
                   ON b.band = m.band AND b.bkey = m.bkey
                 GROUP BY b.doc_id),
    sizes AS (SELECT cluster_id, count(*) AS cluster_size
              FROM clusters GROUP BY cluster_id)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           count(*) AS n_clusters,
           CAST(sum(cluster_size) AS BIGINT) AS n_docs,
           CAST(sum(cluster_size) - count(*) AS BIGINT) AS n_dropped
    FROM sizes GROUP BY cluster_size
    """,
)
def llm_dedup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact report: histogram of near-dup cluster sizes with
    docs-kept vs docs-dropped per size — the number a data-curation
    run publishes ('one 140-doc clique, 400 singletons, 22% dropped').
    Built on the exact MinHash cluster assignment; two vocab-sized
    aggs on top."""
    prep(spark)
    clusters = llm_dedup_minhash(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
        (F.sum("cluster_size") - F.count("*")).alias("n_dropped"),
    )
