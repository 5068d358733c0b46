"""Invariant tests for batch 62 (GMV bridge, LOO encoding, entropy rate)."""

from __future__ import annotations

import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_gmv_bridge_decomposition_is_exact(spark):
    rows = ent.queries()["sales_gmv_bridge"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert abs(r.residual) < 1e-4  # algebraic identity
        recomposed = r.volume_effect + r.price_effect + r.joint_effect
        assert abs(recomposed - r.revenue_delta) < 1e-3


def test_loo_encoding_unbiased_and_leak_free(spark):
    rows = ent.queries()["feat_target_encoding_loo"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    for r in rows:
        # LOO mean equals the plain category rate (unbiasedness)
        assert abs(r.te_mean - r.target_rate) < 1e-4
        assert r.te_min <= r.te_mean <= r.te_max
        # no self-leakage: rows with y=1 see a LOWER encoding than
        # rows with y=0 (their own positive label is excluded)
        if 0.0 < r.target_rate < 1.0:
            assert r.te_label_gap < 0


def test_entropy_rate_chain_rule(spark):
    r = ent.queries()["llm_entropy_rate"](spark, SF_SMALL).collect()[0]
    # conditioning cannot increase entropy
    assert 0.0 <= r.h_cond_nats <= r.h_joint_nats
    assert r.h_marginal_nats >= 0.0
    assert abs(r.perplexity - math.exp(r.h_cond_nats)) < 0.01 * r.perplexity
    assert r.n_bigram_types <= r.n_bigrams
