"""Invariant tests for the round-3 batch 6 operators (extras22)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_kanon_report_consistent(spark):
    (r,) = _rows(spark, "dq_kanon")
    customers = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert r.min_group >= 1
    assert 0 <= r.rows_below_k <= customers
    assert 0.0 <= r.frac_below_k <= 1.0
    assert r.min_l_diversity >= 1
    # the flag must agree with the reported minimum
    assert r.k_anonymous == (r.min_group >= 5)


def test_link_predict_scores_valid(spark):
    rows = _rows(spark, "graph_link_predict")
    seen = set()
    for r in rows:
        assert r.u < r.v
        assert (r.u, r.v) not in seen
        seen.add((r.u, r.v))
        assert 0.0 < r.jaccard <= 1.0
        assert 1 <= r.common_neighbors <= min(r.deg_u, r.deg_v)


def test_link_predict_excludes_existing_edges(spark):
    from pyspark.sql import functions as F

    rows = _rows(spark, "graph_link_predict")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    t = docs.select(F.split("text", " ").alias("l")).filter(F.size("l") >= 2)
    edges = (
        t.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("l"), 1, F.size("l") - 1),
                    F.slice(F.col("l"), 2, F.size("l") - 1),
                    lambda x, y: F.struct(
                        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .collect()
    )
    edge_set = {(e.a, e.b) for e in edges}
    for r in rows:
        assert (r.u, r.v) not in edge_set  # predictions are NEW links only
