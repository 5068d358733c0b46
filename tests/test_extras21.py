"""Invariant tests for the round-3 batch 5 operators (extras21)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_incremental_merge_equals_full_reload(spark):
    from pyspark.sql import functions as F

    merged = {r.o_orderstatus: r for r in _rows(spark, "pipeline_incremental")}
    full = (
        spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        )
        .collect()
    )
    assert {r.o_orderstatus: (r.n, r.rev) for r in full} == {
        k: (v.n_orders, v.revenue) for k, v in merged.items()
    }


def test_runs_test_counts_consistent(spark):
    rows = _rows(spark, "stats_runs_test")
    assert rows
    for r in rows:
        # runs can't exceed the number of moves, and there is at least one
        assert 1 <= r.n_runs <= r.n_up + r.n_down
        # first move always starts a run (IS DISTINCT FROM NULL lag)
        assert r.n_runs >= 1


def test_acf_profile_shape(spark):
    rows = _rows(spark, "ts_autocorr_k")
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, set()).add(r.lag)
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
        assert r.n_pairs > 0
    for lags in by_type.values():
        assert lags == set(range(1, 8))
