"""Invariant tests for batch 30 (CUPED, cross-source dups, ABC-XYZ)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_cuped_identities(spark):
    rows = ent.queries()["stats_cuped"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_users > 1
    assert 0.0 - 1e-9 <= r.var_reduction <= 1.0 + 1e-9
    assert 0 <= r.var_adj <= r.var_y + 1e-6
    # var_adj = var_y * (1 - rho^2)
    assert abs(r.var_adj - r.var_y * (1 - r.var_reduction)) < max(
        1e-3, r.var_y * 1e-4
    )


def test_cross_source_dups_counts(spark):
    rows = ent.queries()["llm_cross_source_dups"](spark, SF_SMALL).collect()
    for r in rows:
        assert r.source_a < r.source_b
        assert 1 <= r.n_shared_texts <= r.n_dup_pairs


def test_abc_xyz_partitions_everything(spark):
    rows = ent.queries()["orders_abc_xyz"](spark, SF_SMALL).collect()
    assert rows
    assert {r.abc for r in rows} <= {"A", "B", "C"}
    assert {r.xyz for r in rows} <= {"X", "Y", "Z"}
    assert abs(sum(r.demand_share for r in rows) - 1.0) < 1e-4
    # cells are unique
    cells = [(r.abc, r.xyz) for r in rows]
    assert len(cells) == len(set(cells))
    # A class must carry more demand share per part than C overall
    share = {}
    parts = {}
    for r in rows:
        share[r.abc] = share.get(r.abc, 0) + r.demand_share
        parts[r.abc] = parts.get(r.abc, 0) + r.n_parts
    if "A" in share and "C" in share:
        assert share["A"] / parts["A"] > share["C"] / parts["C"]
