"""Invariant tests for batch 95 (Adamic-Adar, AC1, adoption curve)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_adamic_adar_ranking(spark):
    rows = ent.queries()["graph_adamic_adar"](spark, SF_SMALL).collect()
    assert rows
    scores = [r.adamic_adar for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.u < r.v
        assert r.common_neighbors >= 1
        assert r.adamic_adar > 0.0


def test_gwet_ac1_vs_kappa(spark):
    r = ent.queries()["stats_gwet_ac1"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r.po <= 1.0
    assert -1.0 <= r.kappa <= 1.0
    assert -1.0 <= r.ac1 <= 1.0
    # AC1's chance term uses the mean marginal; both are probabilities
    assert 0.0 <= r.pe_ac1 <= 0.5 + 1e-9  # 2*pi*(1-pi) maxes at 0.5
    assert 0.0 <= r.pe_kappa <= 1.0


def test_adoption_curve_monotone(spark):
    rows = ent.queries()["sales_adoption_curve"](spark, SF_SMALL).collect()
    assert rows
    cums = [r.cum_customers for r in rows]
    assert cums == sorted(cums)
    shares = [r.adoption_share for r in rows]
    assert all(0.0 < s <= 0.5 for s in shares)
    assert all(
        rows[i].new_customers == cums[i] - (cums[i - 1] if i else 0)
        for i in range(len(rows))
    )
