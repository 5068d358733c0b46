"""Invariant tests for the round-3 batch 9 operators (pca_vocab)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_variance_explained_bounds(spark):
    (r,) = _rows(spark, "vec_pca_variance_explained")
    # Rayleigh quotient of a unit vector is bounded by the spectrum,
    # hence by the trace; a near-flat 64-dim spectrum puts the ratio
    # in a narrow band above the uniform 1/64
    assert 0.0 < r.eigenvalue <= r.total_variance
    assert 1.0 / 64 - 1e-6 <= r.explained_ratio <= 1.0
    assert abs(r.explained_ratio - r.eigenvalue / r.total_variance) < 1e-5


def test_oov_curve_monotone(spark):
    rows = sorted(_rows(spark, "llm_vocab_oov_curve"),
                  key=lambda r: r.vocab_size)
    assert [r.vocab_size for r in rows] == [16, 32, 64, 128, 256, 512, 1024]
    for lo, hi in zip(rows, rows[1:]):
        assert hi.covered_tokens >= lo.covered_tokens
        assert hi.oov_rate <= lo.oov_rate
    for r in rows:
        assert 0.0 <= r.oov_rate <= 1.0
        # once the grid exceeds the vocabulary, everything is covered
        if r.vocab_size >= r.total_types:
            assert r.oov_rate == 0.0


def test_paa_sax_shape(spark):
    rows = _rows(spark, "ts_paa_sax")
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.sax_symbol in ("a", "b", "c", "d")
        assert r.seg_days >= 1
    for et, rs in by_type.items():
        assert sorted(x.seg for x in rs) == list(range(6))
        # segment days partition the series
        n_days = sum(x.seg_days for x in rs)
        assert n_days >= 6
