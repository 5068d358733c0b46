"""Unit tests for the round-2 batch-7 operators (extras12.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_diag_skew_ordering_and_mean(spark):
    """Top-10 by count descending; skew_factor of the heaviest key is
    >= that of the lightest listed key and counts match a recount."""
    pdf = ent.queries()["diag_skew"](spark, SF_SMALL).toPandas()
    assert len(pdf) == 10
    assert (pdf.cnt.values[:-1] >= pdf.cnt.values[1:]).all()
    assert (pdf.skew_factor > 0).all()
    li = table(spark, SF_SMALL, "lineitem")
    top = int(pdf.iloc[0].key)
    recount = li.filter(F.col("l_suppkey") == top).count()
    assert recount == int(pdf.iloc[0].cnt)


def test_dedup_incremental_partitions_delta(spark):
    """Every delta doc gets exactly one status; statuses come from the
    fixed vocabulary; delta size matches the hash-bucket rule."""
    pdf = ent.queries()["llm_dedup_incremental"](spark, SF_SMALL).toPandas()
    assert set(pdf.status.unique()) <= {"dup_of_corpus", "dup_within_batch", "new"}
    d = table(spark, SF_SMALL, "documents")
    n_delta = d.filter(
        (F.col("doc_id") * 2654435761 % 4294967296) >= 3865470566
    ).count()
    assert len(pdf) == n_delta
    assert pdf.doc_id.is_unique


def test_epoch_order_is_a_permutation_per_shard(spark):
    """Positions within each shard are 1..n with no gaps, every doc
    appears exactly once, and the order is reproducible."""
    q = ent.queries()["train_epoch_order"]
    pdf = q(spark, SF_SMALL).toPandas()
    n = table(spark, SF_SMALL, "documents").count()
    assert len(pdf) == n and pdf.doc_id.is_unique
    for _, grp in pdf.groupby("shard"):
        assert sorted(grp.pos) == list(range(1, len(grp) + 1))
    pdf2 = q(spark, SF_SMALL).toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = pdf2.sort_values("doc_id").reset_index(drop=True)
    assert (a.pos == b.pos).all() and (a.shard == b.shard).all()
