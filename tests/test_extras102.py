"""Invariant tests for batch 102 (lang conflicts, ANCOVA, CA trend)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_lang_conflicts_bounds(spark):
    r = ent.queries()["llm_lang_label_conflicts"](spark, SF_SMALL).collect()[0]
    assert r.n_distinct_texts > 0
    assert 0 <= r.n_lang_conflicts <= r.n_duped_texts
    assert r.docs_in_conflict >= 2 * r.n_lang_conflicts or r.n_lang_conflicts == 0
    assert 0.0 <= r.conflict_share_of_dups <= 1.0


def test_ancova_adjustment(spark):
    rows = ent.queries()["stats_ancova_lite"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    slope = rows[0].pooled_slope
    assert all(abs(r.pooled_slope - slope) < 1e-9 for r in rows)
    for r in rows:
        # adjusted mean = raw - b*(x_g - x_grand), so the identity holds
        assert r.n > 0
        assert abs(r.adjusted_mean - r.raw_mean) < abs(slope) * 0.11 + 1e-6


def test_cochran_armitage_null(spark):
    r = ent.queries()["stats_cochran_armitage"](spark, SF_SMALL).collect()[0]
    assert r.n > 0
    assert 0.0 < r.overall_rate < 1.0
    # return flag independent of quantity band -> small trend z
    assert abs(r.ca_z) < 5.0
