"""Invariant tests for batch 122 (CI audit, modularity, alignment)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_ci_method_audit(spark):
    r = ent.queries()["stats_ci_method_audit"](spark, SF_SMALL).collect()[0]
    assert r.n_nations > 0
    assert r.mean_wald_width > 0 and r.mean_wilson_width > 0
    # widths are the same order of magnitude
    assert 0.5 < r.mean_wald_width / r.mean_wilson_width < 2.0
    # Wilson never escapes [0, 1] by construction
    assert r.wilson_boundary_violations == 0


def test_modularity_null(spark):
    r = ent.queries()["graph_modularity"](spark, SF_SMALL).collect()[0]
    assert r.n_communities > 1
    assert 0.0 <= r.within_edge_share <= 1.0
    # arbitrary first-letter partition: Q near zero
    assert -0.5 < r.modularity_q < 0.5


def test_label_text_alignment(spark):
    r = ent.queries()["vec_label_text_alignment"](spark, SF_SMALL).collect()[0]
    assert r.n_joined > 0
    assert r.n_labels > 1 and r.n_langs > 1
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0
