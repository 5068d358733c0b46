"""Bounded-candidate contract for llm_dedup_editdist (VERDICT r9
item 5): the per-(lang, source, slot, segment) index bucket cap that
turns the measured exp-1.34 candidate growth into a linear bound.

Invariants pinned here (sf0.001 for speed):
- a cap at least as large as the biggest bucket is a NO-OP — the
  capped result equals the exact contract key's result exactly;
- a tight cap only ever REMOVES candidate pairs (subset, never new);
- the overflow accounting is arithmetically consistent with the cap
  (entries_dropped == Σ max(sz − cap, 0); engaged iff any bucket
  overflows).
"""

from __future__ import annotations

import pytest

from etl_framework_spark.queries.dedup_editdist import (
    EDITDIST_TAU,
    editdist_bucket_stats,
    editdist_candidates,
    llm_dedup_editdist,
    llm_dedup_editdist_capped,
)

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


@pytest.fixture(scope="module")
def max_bucket(spark) -> int:
    return editdist_bucket_stats(spark, SF, 1).collect()[0]["max_bucket"]


def test_cap_at_max_bucket_is_exact(spark, max_bucket) -> None:
    exact = llm_dedup_editdist(spark, SF)
    capped = llm_dedup_editdist_capped(spark, SF, max_bucket)
    assert _pairs(capped) == _pairs(exact)


def test_tight_cap_is_a_subset(spark) -> None:
    _, _, pruned_exact = editdist_candidates(spark, SF)
    _, _, pruned_capped = editdist_candidates(spark, SF, bucket_cap=1)
    exact_pairs = _pairs(pruned_exact)
    capped_pairs = _pairs(pruned_capped)
    assert capped_pairs <= exact_pairs
    # and the final (post-DP) result is a subset too
    assert _pairs(llm_dedup_editdist_capped(spark, SF, 1)) <= _pairs(
        llm_dedup_editdist(spark, SF)
    )


def test_overflow_accounting_consistent(spark, max_bucket) -> None:
    # cap = max bucket: nothing overflows, nothing dropped
    row = editdist_bucket_stats(spark, SF, max_bucket).collect()[0]
    assert row["n_buckets_over_cap"] == 0
    assert row["entries_dropped"] == 0
    assert row["max_bucket"] == max_bucket
    # cap = 1: every multi-entry bucket overflows; dropped = Σ (sz − 1)
    row1 = editdist_bucket_stats(spark, SF, 1).collect()[0]
    _, _, idx, _ = __import__(
        "etl_framework_spark.queries.dedup_editdist",
        fromlist=["_editdist_base"],
    )._editdist_base(spark, SF)
    n_entries = idx.count()
    assert row1["entries_dropped"] == n_entries - row1["n_buckets"]
    assert (row1["n_buckets_over_cap"] > 0) == (max_bucket > 1)


def test_tau_consistency() -> None:
    """The hoisted constant really is what the oracle SQL carries."""
    from etl_framework_spark.registry import ORACLES

    sql = ORACLES["llm_dedup_editdist"]
    assert f"<= {EDITDIST_TAU}" in sql
    assert f"<= {2 * EDITDIST_TAU}" in sql
