"""Invariant tests for batch 34 (id gaps, Heaps' law)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_id_gap_accounting_closes(spark):
    rows = ent.queries()["dq_id_gaps"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.min_id < r.max_id
    # ids + missing must tile the observed range exactly
    assert r.n_ids + r.n_missing == r.max_id - r.min_id + 1
    assert 0 < r.density <= 1.0
    assert r.largest_gap >= (1 if r.n_gaps else 0)


def test_heaps_beta_in_sublinear_band(spark):
    rows = ent.queries()["llm_heaps_law"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_points >= 5
    # vocabulary growth must be sublinear (the tiny synthetic vocab
    # saturates at sf0.001, so beta = 0 exactly is legitimate)
    assert 0.0 <= r.heaps_beta < 1.0
    assert r.heaps_k > 0
    assert r.final_vocab <= r.final_tokens
    # the fitted curve should reproduce the endpoint within 2x
    import math

    pred = r.heaps_k * (r.final_tokens ** r.heaps_beta)
    assert 0.5 < pred / r.final_vocab < 2.0
