"""Unit tests for the round-2 batch-9 feature-prep operators."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as ent
from etl_framework_spark.catalog import table
from tests.conftest import SF_SMALL


def test_feat_scale_ranges(spark):
    """Min-max lands in [0,1]; per-brand z-scores average ~0."""
    pdf = ent.queries()["feat_scale"](spark, SF_SMALL).toPandas()
    n = table(spark, SF_SMALL, "part").count()
    assert len(pdf) == n
    mm = pdf.minmax.dropna()
    assert (mm >= 0).all() and (mm <= 1).all()
    for _, grp in pdf.groupby("p_brand"):
        z = grp.z.dropna()
        if len(z) > 1:
            assert abs(z.mean()) < 1e-3


def test_feat_index_is_dense_and_frequency_ordered(spark):
    """Indices are 0..n-1 with no gaps and frequencies are
    non-increasing along the index order."""
    pdf = (
        ent.queries()["feat_index"](spark, SF_SMALL)
        .toPandas()
        .sort_values("idx")
        .reset_index(drop=True)
    )
    assert list(pdf.idx) == list(range(len(pdf)))
    assert (pdf.freq.values[:-1] >= pdf.freq.values[1:]).all()
    assert pdf.label.is_unique


def test_feat_hashing_conserves_mass(spark):
    """Bucket token mass sums to the corpus token count, vocabulary
    count to the distinct-token count; bucket ids are hex pairs."""
    pdf = ent.queries()["feat_hashing"](spark, SF_SMALL).toPandas()
    d = table(spark, SF_SMALL, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("t"))
    assert pdf.total_freq.sum() == toks.count()
    assert pdf.n_tokens.sum() == toks.distinct().count()
    assert pdf.bucket.str.fullmatch(r"[0-9a-f]{2}").all()
    assert (pdf.max_token_freq <= pdf.total_freq).all()
