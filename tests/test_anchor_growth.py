"""Anchor-modulus growth path, executed end-to-end on real data
(VERDICT r8 item 4 + ADVICE r8 lockstep guard).

``anchor_modulus`` returns 5 through 500k vectors (every oracle-checked
SF) and grows past that to pin the anchor count. Until now the >5
branch only had unit coverage; here it drives ``vec_hubness`` and
``vec_two_nn_dim`` against the 30× probe corpus (60k real vectors)
with the cap monkeypatched to 1000 — the same code path a 1.5M-vector
corpus takes at the production cap (modulus 60 here vs 15 there; the
branch, the collect guard, and the anchor pinning are identical).
Rows-only by nature: the static ``vec_id % 5`` oracles legitimately
stop applying in this regime, which is exactly what the lockstep
guard (``anchor_modulus_locked``) enforces — tested below both ways.

Skips cleanly when the probe corpus hasn't been built (the per-round
scale probe builds it).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as ent
from etl_framework_spark.operators import similarity

X30 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "scale_probe_data", "x30",
)
_HAVE_X30 = os.path.exists(os.path.join(X30, ".complete"))

N_X30 = 60_000  # 30× replicas of sf0.1's 2k vectors
_TEST_CAP = 1_000  # → modulus 60 on x30: the growth branch, for real


def test_lockstep_guard_raises_past_oracle_regime(monkeypatch):
    """Without the opt-in env, a corpus past 500k vectors must raise
    loudly instead of silently diverging from the `% 5` oracle."""
    monkeypatch.delenv(similarity.ANCHOR_GROWTH_ENV, raising=False)
    assert similarity.anchor_modulus_locked(400_000) == 5
    with pytest.raises(ValueError, match="vec_id % 5"):
        similarity.anchor_modulus_locked(1_500_000)
    monkeypatch.setenv(similarity.ANCHOR_GROWTH_ENV, "1")
    assert similarity.anchor_modulus_locked(1_500_000) == 15


@pytest.mark.parametrize("off", ["0", "false", "no", "off", "", " "])
def test_lockstep_guard_env_parsed_as_boolean(monkeypatch, off):
    """ADVICE r9: SPARK_GRAFT_ALLOW_ANCHOR_GROWTH=0 (or any falsy
    spelling) must keep the guard ARMED — the old truthiness check
    disarmed it for every non-empty string."""
    monkeypatch.setenv(similarity.ANCHOR_GROWTH_ENV, off)
    with pytest.raises(ValueError, match="vec_id % 5"):
        similarity.anchor_modulus_locked(1_500_000)


@pytest.mark.parametrize("on", ["1", "true", "TRUE", "yes", "on"])
def test_lockstep_guard_env_accepts_boolean_spellings(monkeypatch, on):
    monkeypatch.setenv(similarity.ANCHOR_GROWTH_ENV, on)
    assert similarity.anchor_modulus_locked(1_500_000) == 15


@pytest.mark.skipif(not _HAVE_X30, reason="x30 probe corpus not built")
def test_hubness_growth_branch_on_x30(spark, monkeypatch):
    monkeypatch.setattr(similarity, "_MAX_ANCHOR_COLLECT", _TEST_CAP)
    monkeypatch.setenv(similarity.ANCHOR_GROWTH_ENV, "1")
    assert similarity.anchor_modulus(N_X30) == 60  # growth branch armed
    row = ent.queries()["vec_hubness"](spark, X30).collect()
    assert len(row) == 1
    r = row[0]
    # anchor count pinned at the cap: 60000 / 60 = 1000 anchors
    assert r.n_vecs == N_X30
    # plausible k-occurrence stats: mass conserved (sum k_occ =
    # anchors * k → mean = anchors*k/n), a hubbier max, few antihubs
    # is impossible at 1.7% anchor coverage — most vectors are in
    # nobody's sampled top-10
    anchors = N_X30 // 60
    assert abs(r.mean_k_occ - anchors * 10 / N_X30) < 0.01
    assert r.max_k_occ >= 1
    assert 0 < r.n_antihubs < N_X30
    assert r.k_occ_skewness > 0  # sparse occupancy is right-skewed


@pytest.mark.skipif(not _HAVE_X30, reason="x30 probe corpus not built")
def test_two_nn_growth_branch_on_x30(spark, monkeypatch):
    monkeypatch.setattr(similarity, "_MAX_ANCHOR_COLLECT", _TEST_CAP)
    monkeypatch.setenv(similarity.ANCHOR_GROWTH_ENV, "1")
    row = ent.queries()["vec_two_nn_dim"](spark, X30).collect()
    assert len(row) == 1
    r = row[0]
    # ~1000 anchors survive the r1>0 filter (replica vectors can be
    # exact duplicates of the base → r1 == 0 drops them)
    assert 0 < r.n_points <= _TEST_CAP + 1
    assert 0 < r.intrinsic_dim <= 64.0
