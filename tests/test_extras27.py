"""Invariant tests for the round-3 batch 11 operators (extras27)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

RAKE_STOPS = {"the", "of", "and", "to", "in", "is", "for", "on", "with",
              "as", "a", "an", "or", "at", "by", "it"}


def _rows(spark, key):
    return ent.queries()[key](spark, SF_SMALL).collect()


def test_rake_phrases_exclude_stopwords(spark):
    rows = _rows(spark, "llm_rake_keywords")
    assert 0 < len(rows) <= 20
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= 3
        assert r.n_words == len(words)
        assert not (set(words) & RAKE_STOPS)  # delimiters never inside
        assert r.score > 0
        assert r.n_occurrences >= 1
    # top-k is ordered by score under the (score, phrase) total order
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(
        scores
    )


def test_audio_window_geometry(spark):
    rows = _rows(spark, "mm_audio_window")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        assert r.n_samples == r.n_bytes // 2
        if r.n_frames > 0:
            consumed = 400 + (r.n_frames - 1) * 160
            assert consumed <= r.n_samples
            # one more hop would overrun the signal
            assert consumed + 160 > r.n_samples
            assert r.tail_samples == r.n_samples - consumed
        else:
            assert r.n_samples < 400
            assert r.tail_samples == r.n_samples
