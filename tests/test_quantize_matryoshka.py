"""Invariant tests for the round-3 batch 2 operators (quantize_matryoshka)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_threshold_sweep_is_monotone(spark):
    rows = sorted(_rows(spark, "llm_dedup_threshold_sweep"),
                  key=lambda r: r.tau)
    assert len(rows) == 19
    for lo, hi in zip(rows, rows[1:]):
        # raising tau can only shrink the clearing pair set
        assert hi.n_pairs <= lo.n_pairs
        assert hi.n_dropped <= lo.n_dropped
        assert hi.keep_rate >= lo.keep_rate
    for r in rows:
        assert 0.0 <= r.keep_rate <= 1.0
        assert r.n_dropped <= r.n_pairs or r.n_pairs == 0


def test_int8_quantization_error_bounded(spark):
    rows = _rows(spark, "vec_quantize_int8")
    assert rows
    for r in rows:
        # absmax int8: per-element error <= scale/(2*127); scale <= 1ish
        # for unit-normed synthetic embeddings — just require sane bounds
        assert 0.0 <= r.mean_rmse <= r.worst_abs_err + 1e-9
        assert r.worst_abs_err < 0.1
        assert r.n_vecs > 0


def test_matryoshka_overlap_bounds(spark):
    (r,) = _rows(spark, "vec_matryoshka")
    assert r.n_queries > 0
    assert 0 <= r.min_overlap <= r.max_overlap <= 10
    assert 0.0 <= r.recall_at_10 <= 1.0
    # truncation keeps SOME signal: recall must beat random top-10
    # (10/n_corpus) by a wide margin on structured embeddings
    assert r.recall_at_10 > 0.1


def test_format_strings_roundtrip(spark):
    rows = _rows(spark, "fn_format")
    assert rows
    for r in rows[:50]:
        assert r.fmt_zero == f"{r.p_partkey:08d}"
        assert r.fmt_hex == f"{r.p_partkey:x}"
        assert r.fmt_comma == f"{r.p_partkey * 1009:,d}"
        assert r.fmt_multi.endswith(f"-{r.p_partkey:x}")


def test_ngram_coverage_decreases_with_n(spark):
    rows = {r.n: r for r in _rows(spark, "llm_ngram_coverage")}
    assert set(rows) == {1, 2, 3}
    for n, r in rows.items():
        assert 0.0 <= r.coverage <= 1.0
        assert r.covered_types <= r.test_types
    # longer n-grams generalize worse: coverage must not increase with n
    assert rows[1].coverage >= rows[2].coverage >= rows[3].coverage
