"""Unit tests for the round-2 batch-10 retrieval operators."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_bm25_top20_sorted_and_positive(spark):
    """Scores are positive (+1 idf form is never negative), sorted
    descending, and every scored doc really contains a query token."""
    pdf = ent.queries()["llm_bm25"](spark, SF_SMALL).toPandas()
    assert 0 < len(pdf) <= 20
    assert (pdf.bm25 > 0).all()
    assert (pdf.bm25.values[:-1] >= pdf.bm25.values[1:]).all()
    d = table(spark, SF_SMALL, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    top3 = [
        r["token"]
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(3)
        .collect()
    ]
    hits = set(
        r["doc_id"]
        for r in tok.filter(F.col("token").isin(top3))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert set(pdf.doc_id) <= hits


def test_rank_fusion_bounds(spark):
    """RRF scores live in (0, 2/61]; a doc ranked #1 in both lists
    would score exactly 2/61; top-20 is sorted descending."""
    pdf = ent.queries()["rank_fusion"](spark, SF_SMALL).toPandas()
    assert 0 < len(pdf) <= 20
    assert (pdf.rrf > 0).all()
    assert (pdf.rrf <= round(2 / 61, 6) + 1e-9).all()
    assert (pdf.rrf.values[:-1] >= pdf.rrf.values[1:]).all()
