"""Invariant tests for batch 126 (injection scan, return trend, mask)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_injection_scan_clean(spark):
    rows = ent.queries()["llm_injection_scan"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # clean synthetic corpus: no injection signatures
        assert r.n_docs_hit == 0
        assert r.hit_share == 0.0


def test_return_rate_trend(spark):
    r = ent.queries()["sales_return_rate_trend"](spark, SF_SMALL).collect()[0]
    assert r.n_months > 12
    assert 0.0 < r.mean_return_share < 1.0
    # stationary flag assignment -> slope ~ 0
    assert abs(r.share_slope_per_month) < 0.01


def test_masking_audit(spark):
    r = ent.queries()["fn_masking"](spark, SF_SMALL).collect()[0]
    assert r.n_rows > 0
    assert r.distinct_masked <= r.distinct_raw
    assert r.distinct_suffix_redacted <= r.distinct_raw
    assert 0.0 < r.mask_distinct_ratio <= 1.0
