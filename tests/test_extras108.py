"""Invariant tests for batch 108 (adstock, coherence, Haar energy)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_adstock_decays(spark):
    rows = ent.queries()["events_adstock_fit"](spark, SF_SMALL).collect()
    assert [r.decay for r in rows] == [0.3, 0.5, 0.7]
    for r in rows:
        assert -1.0 <= r.corr_with_purchases <= 1.0


def test_topic_coherence_negative(spark):
    rows = ent.queries()["llm_topic_coherence"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # C(5,2) pairs per source
        assert r.n_pairs == 10
        # UMass coherence is a sum of log(p<=1) terms -> non-positive-ish
        assert r.umass_coherence <= 1.0


def test_haar_energy_shares(spark):
    rows = ent.queries()["ts_haar_energy"](spark, SF_SMALL).collect()
    assert [r.level for r in rows] == [1, 2, 3, 4]
    total_share = sum(r.energy_share for r in rows)
    assert abs(total_share - 1.0) < 1e-3
    for r in rows:
        assert r.energy >= 0.0
        assert r.n_blocks > 0
    # finer levels have more blocks
    blocks = [r.n_blocks for r in rows]
    assert blocks == sorted(blocks, reverse=True)
