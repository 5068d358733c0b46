"""Invariant tests for batch 75 (cannibalization, pairwise identity, enum drift)."""

from __future__ import annotations

import itertools
import math

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

from etl_framework_spark.catalog import table


def test_cannibalization_sorted_ascending(spark):
    rows = ent.queries()["sales_cannibalization"](spark, SF_SMALL).collect()
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a.daily_rev_corr <= b.daily_rev_corr
    for r in rows:
        assert -1.0 <= r.daily_rev_corr <= 1.0
        assert r.brand_a < r.brand_b
        assert r.n_days >= 5  # enough shared days for a correlation


def test_pairwise_identity_matches_bruteforce(spark):
    rows = {r.label: r for r in ent.queries()["vec_mean_pairwise_sim"](spark, SF_SMALL).collect()}
    # brute-force one label and compare
    label = sorted(rows)[0]
    vecs = [
        [float(x) for x in r.embedding]
        for r in table(spark, SF_SMALL, "embeddings")
        .filter(f"label = {label}")
        .collect()
    ]
    n = len(vecs)
    assert n >= 2
    dots = [
        sum(a * b for a, b in zip(u, v))
        for u, v in itertools.combinations(vecs, 2)
    ]
    brute = sum(dots) * 2 / (n * (n - 1))
    assert math.isclose(rows[label].mean_pairwise_dot, brute, rel_tol=1e-4, abs_tol=1e-4)
    assert rows[label].n_vectors == n


def test_enum_drift_counts(spark):
    rows = sorted(
        ent.queries()["dq_enum_drift"](spark, SF_SMALL).collect(),
        key=lambda r: r.week,
    )
    assert rows
    # first week: every value is new; last week: nothing 'disappears'
    assert rows[0].n_new == rows[0].n_values
    assert rows[-1].n_disappearing == 0
    for r in rows:
        assert 0 <= r.n_new <= r.n_values
        assert 0 <= r.n_disappearing <= r.n_values
