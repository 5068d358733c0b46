"""Planted-near-duplicate behavior of the embedding dedup family at
probe scale (r9, extending VERDICT r8 item 7 beyond ANN/IVF).

The probe corpus's replica construction (tools/scale_probe.py) plants
factor−1 near-twins per vector (replica k = base + k·1e-3 on every
dim, label copied verbatim, cos ≥ 0.997 measured) with KNOWN ids —
ground truth the base corpus cannot provide. Two contracts:

- ``llm_dedup_embedding`` (cosine ≥ τ within label blocks) is EXACT,
  so its planted recall must be 1.0: every one of the
  2000 · C(10,2) = 90,000 twin pairs appears. A blocking or kernel
  bug that silently drops pairs fails here even though the sf0.01
  oracle (no twins) stays green.
- ``llm_semdedup`` must collapse the planted duplication: its kept
  count at ×10 must match the base corpus's kept count within 5%
  (measured 523 vs 526) — the "dedup output is invariant to
  duplication factor" property that makes semantic dedup worth its
  cost at 100 TB.

Skips cleanly when the x10 probe corpus hasn't been built.
"""

from __future__ import annotations

import os
from itertools import combinations

import pytest

import __spark_entry__ as ent

X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "scale_probe_data", "x10",
)
BASE = "/root/testdata/sf0.1"
N_BASE = 2_000
FACTOR = 10

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(X10, ".complete")),
    reason="x10 probe corpus not built",
)


def test_embedding_dedup_finds_every_planted_twin_pair(spark):
    got = {
        (r.id_a, r.id_b)
        for r in ent.queries()["llm_dedup_embedding"](spark, X10).collect()
    }
    missing = 0
    for base_id in range(N_BASE):
        for ka, kb in combinations(range(FACTOR), 2):
            pair = (base_id + ka * N_BASE, base_id + kb * N_BASE)
            if pair not in got:
                missing += 1
    assert missing == 0, (
        f"{missing} of {N_BASE * 45} planted twin pairs missing from the "
        "exact label-blocked dedup"
    )


def test_semdedup_output_invariant_to_duplication(spark):
    def kept(sf: str) -> int:
        return sum(
            1
            for r in ent.queries()["llm_semdedup"](spark, sf).collect()
            if r.keep
        )

    k_base = kept(BASE)
    k_x10 = kept(X10)
    assert abs(k_x10 - k_base) <= 0.05 * k_base, (k_base, k_x10)
