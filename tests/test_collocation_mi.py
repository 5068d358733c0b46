"""Invariant tests for batch 54 (LLR collocations, infogain, Simpson)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_collocations_llr_ranked_and_positive_support(spark):
    rows = ent.queries()["llm_collocations_llr"](spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 20
    for a, b in zip(rows, rows[1:]):
        assert a.llr >= b.llr  # returned in descending significance
    for r in rows:
        assert r.n_bigram >= 10
        assert r.llr >= 0.0  # G-squared is non-negative


def test_infogain_noise_probe_scores_lowest(spark):
    rows = {r.feature: r for r in ent.queries()["feat_infogain"](spark, SF_SMALL).collect()}
    assert set(rows) == {"priority", "month", "custmod"}
    for r in rows.values():
        assert r.mi_nats >= -1e-9  # MI is non-negative
        assert 0.0 <= r.uncertainty_coeff <= 1.0 + 1e-9
        assert r.h_label > 0.0
    # the custkey%10 noise probe must carry (near-)zero information
    assert rows["custmod"].mi_nats < 0.01


def test_simpsons_pooled_row_consistency(spark):
    rows = {r.grp: r for r in ent.queries()["stats_simpsons"](spark, SF_SMALL).collect()}
    assert "ALL" in rows and len(rows) == 4
    assert rows["ALL"].flipped is False  # pooled can't flip vs itself
    assert rows["ALL"].n == sum(r.n for g, r in rows.items() if g != "ALL")
    for r in rows.values():
        assert -1.0 <= r.corr <= 1.0
