"""Invariant tests for batch 61 (two-phase topk, MH pooling, charclass)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

from pyspark.sql import functions as F
from etl_framework_spark.catalog import table


def test_two_phase_topk_equals_direct(spark):
    rows = ent.queries()["topk_two_phase"](spark, SF_SMALL).collect()
    assert [r.rank for r in rows] == list(range(1, 11))
    direct = (
        table(spark, SF_SMALL, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
        .collect()
    )
    got = [(r.l_orderkey, r.l_linenumber) for r in sorted(rows, key=lambda r: r.rank)]
    want = [(r.l_orderkey, r.l_linenumber) for r in direct]
    assert got == want  # shard-local topk + merge == global topk


def test_mantel_haenszel_consistency(spark):
    r = ent.queries()["stats_mantel_haenszel"](spark, SF_SMALL).collect()[0]
    assert r.n_strata == 5
    assert r.or_mh > 0 and r.or_crude > 0
    assert abs(r.crude_minus_mh - (r.or_crude - r.or_mh)) < 1e-4
    import math

    assert abs(r.log_or_mh - math.log(r.or_mh)) < 1e-3


def test_charclass_shares_partition_unity(spark):
    rows = ent.queries()["llm_charclass_profile"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        total = r.alpha_share + r.digit_share + r.space_share + r.other_share
        assert abs(total - 1.0) < 1e-4  # classes partition the text
        assert 0.0 <= r.upper_share <= r.alpha_share + 1e-9
        assert r.n_docs > 0
