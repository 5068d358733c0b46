"""Invariant tests for batch 59 (DiD, product quantization, TOST)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_did_estimate_near_zero_on_null_effect(spark):
    r = ent.queries()["stats_diff_in_diff"](spark, SF_SMALL).collect()[0]
    # parity of user id cannot cause the value: the DiD estimate must
    # be within a few SEs of zero
    assert r.did_se > 0
    assert abs(r.did_estimate) < 6 * r.did_se
    assert abs(r.did_estimate - (r.delta_treated - r.delta_control)) < 1e-4


def test_pq_errors_and_code_usage(spark):
    rows = ent.queries()["vec_product_quantization"](spark, SF_SMALL).collect()
    assert len(rows) == 8
    n = rows[0].n_vecs
    for r in rows:
        assert r.n_vecs == n  # every vector contributes to every subspace
        assert 0.0 <= r.avg_sq_err <= r.max_sq_err
        assert 1 <= r.codes_used <= 4


def test_tost_consistency(spark):
    rows = ent.queries()["stats_tost_equivalence"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.se > 0 and r.margin > 0
        # z_lower + z_upper == 2*margin/se by construction
        assert abs((r.z_lower + r.z_upper) - 2 * r.margin / r.se) < 1e-3
        if r.equivalent:
            assert abs(r.mean_diff) < r.margin
