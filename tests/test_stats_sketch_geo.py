"""Invariant tests for the round-3 batch 1 operators (stats_sketch_geo):
properties that must hold beyond the hash-vs-oracle equality."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_cms_never_undercounts(spark):
    rows = _rows(spark, "sketch_cms")
    assert rows, "top-k tokens expected"
    for r in rows:
        assert r.cms_est >= r.exact_freq
        assert r.overestimate == r.cms_est - r.exact_freq


def test_bloom_has_no_false_negatives(spark):
    (r,) = _rows(spark, "sketch_bloom")
    assert r.false_neg == 0  # Bloom filters never miss a member
    assert r.true_pos == r.n_members  # every member is probed here
    assert 0 < r.bits_set <= 2048
    assert r.fp_rate is None or 0.0 <= r.fp_rate <= 1.0


def test_cusum_bounds_and_flag_consistency(spark):
    for r in _rows(spark, "ts_cusum"):
        assert r.cusum_max >= 0.0
        assert r.sigma >= 0.0
        # flag must equal the threshold comparison of the emitted stats
        # (quantization slack at the boundary: compare with tolerance)
        if r.flagged:
            assert r.cusum_max > 4.0 * r.sigma - 1e-5
        else:
            assert r.cusum_max <= 4.0 * r.sigma + 1e-5


def test_ks_aa_not_significant(spark):
    (r,) = _rows(spark, "stats_ks_test")
    assert 0.0 <= r.d_stat <= 1.0
    assert not r.significant  # same-generator populations: A/A sanity


def test_mannwhitney_aa_not_significant(spark):
    (r,) = _rows(spark, "stats_mannwhitney")
    assert 0.0 <= r.u1 <= r.n1 * r.n2
    assert not r.significant


def test_geo_distance_bounds(spark):
    half_circumference = math.pi * 6371.0088
    for r in _rows(spark, "fn_geo"):
        assert 0.0 <= r.min_km <= r.max_km <= half_circumference + 1e-6
        assert -6 <= r.cell_lat <= 5
        assert -12 <= r.cell_lon <= 11


def test_kn_probabilities_valid(spark):
    rows = _rows(spark, "llm_kn_bigram")
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r.p_kn <= 1.0
        assert 0.0 < r.p_mle <= 1.0
        assert r.c_pair <= r.c_ctx
        assert r.n_continuations <= r.c_ctx


def test_xent_and_oov_bounds(spark):
    rows = _rows(spark, "llm_eval_xent")
    assert rows
    for r in rows:
        assert r.xent_bits >= 0.0
        assert 0.0 <= r.oov_rate <= 1.0
        assert r.n_test_tokens > 0


def test_shard_manifest_partitions_the_corpus(spark):
    rows = _rows(spark, "shard_manifest")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    assert {r.shard for r in rows} <= set(range(16))
    mean_ratio = sum(r.load_ratio for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 0.35  # roughly balanced hash assignment
