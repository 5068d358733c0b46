"""Invariant tests for batch 129 (alpha, skew diagnosis, event study)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_krippendorff_alpha(spark):
    r = ent.queries()["stats_krippendorff_alpha"](spark, SF_SMALL).collect()[0]
    assert r.n_units > 0
    assert 0.0 <= r.observed_disagreement <= 1.0
    assert 0.0 < r.expected_disagreement <= 1.0
    assert -1.0 <= r.krippendorff_alpha <= 1.0
    # independent raters -> alpha near 0
    assert abs(r.krippendorff_alpha) < 0.3


def test_join_skew_diagnosis(spark):
    rows = ent.queries()["join_skew_diagnosis"](spark, SF_SMALL).collect()
    assert rows
    outs = [r.output_rows for r in rows]
    assert outs == sorted(outs, reverse=True)
    for r in rows:
        # orders is the PK side of this join
        assert r.right_n == 1
        assert r.output_rows == r.left_n * r.right_n
        assert r.skew_factor >= 1.0


def test_event_study_null(spark):
    r = ent.queries()["ts_event_study"](spark, SF_SMALL).collect()[0]
    assert r.n_pre > 0 and r.n_post > 0
    assert abs(r.effect - (r.mean_post - r.mean_pre)) < 1e-3
    # no real intervention at the chosen date -> small z
    assert abs(r.effect_z) < 5.0
