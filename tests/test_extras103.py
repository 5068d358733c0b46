"""Invariant tests for batch 103 (ROUGE-L, quality x dedup, volume)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_rouge_l_bounds(spark):
    rows = ent.queries()["llm_rouge_l"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # LCS cannot exceed either length; shares the 2-token prefix
        assert 2 <= r.lcs_len <= min(r.len_1, r.len_2)
        assert 0.0 < r.rouge_l_f1 <= 1.0
        assert r.doc_id_1 < r.doc_id_2
        # F1 consistency
        expected = 2.0 * r.lcs_len / (r.len_1 + r.len_2)
        assert abs(r.rouge_l_f1 - expected) < 1e-5
    f1s = [r.rouge_l_f1 for r in rows]
    assert f1s == sorted(f1s, reverse=True)


def test_quality_dedup_2x2(spark):
    r = ent.queries()["llm_quality_dedup_interaction"](spark, SF_SMALL).collect()[0]
    total = r.hiq_dup + r.hiq_uniq + r.loq_dup + r.loq_uniq
    assert total > 0
    assert r.odds_ratio > 0.0
    assert r.se_log_or > 0.0
    # log identity
    import math

    assert abs(r.log_or - math.log(r.odds_ratio)) < 1e-4


def test_volume_anomaly_fields(spark):
    r = ent.queries()["dq_partition_volume_anomaly"](spark, SF_SMALL).collect()[0]
    assert r.n_days_eval > 50
    assert 0 <= r.n_volume_drops <= r.n_anomalies <= r.n_days_eval
    assert r.worst_drop_z <= 0.0 or r.n_days_eval == 0
    assert r.worst_drop_z <= r.worst_spike_z
