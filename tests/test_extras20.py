"""Invariant tests for the round-3 batch 4 operators (extras20)."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_shares_sum_to_one_per_axis(spark):
    rows = _rows(spark, "win_share_of_total")
    by_nation, by_month = defaultdict(float), defaultdict(float)
    for r in rows:
        by_nation[r.nation] += r.share_of_nation
        by_month[r.month] += r.share_of_month
    for tot in by_nation.values():
        assert abs(tot - 1.0) < 1e-4
    for tot in by_month.values():
        assert abs(tot - 1.0) < 1e-4


def test_collation_absorbs_case_variants(spark):
    rows = _rows(spark, "fn_collation")
    assert rows
    for r in rows:
        # three case-style unions of the same value set: every CI group
        # holds a multiple of the base count and >1 binary variant
        # (original is UPPER, so lower/initcap differ from it)
        assert r.n_case_variants >= 2
        assert r.type_ci == r.type_ci.lower()
        assert r.n_rows % 3 == 0


def test_degree_hist_counts_nodes_once(spark):
    rows = _rows(spark, "graph_degree_hist")
    n_nodes = sum(r.n_nodes for r in rows)
    # every distinct token that appears adjacent to a different token
    # is a node exactly once across the histogram
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from pyspark.sql import functions as F

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    assert 0 < n_nodes <= vocab
    for r in rows:
        assert r.degree >= 1
