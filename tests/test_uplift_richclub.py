"""Invariant tests for batch 98 (Qini, rich club, regex family)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_qini_aa_null(spark):
    rows = ent.queries()["events_qini_curve"](spark, SF_SMALL).collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert r.n_t + r.n_c > 0
        assert 0 <= r.conv_t <= r.n_t and 0 <= r.conv_c <= r.n_c
        if r.uplift is not None:
            # A/A split: per-decile uplift is noise, bounded by rates
            assert -1.0 <= r.uplift <= 1.0


def test_rich_club_fields(spark):
    r = ent.queries()["graph_rich_club"](spark, SF_SMALL).collect()[0]
    assert 0 < r.n_rich < r.n_nodes
    assert 0 <= r.rich_edges <= r.n_edges
    assert 0.0 <= r.rich_density <= 1.0
    assert 0.0 < r.overall_density <= 1.0
    # ratio consistent with its parts
    assert abs(r.rich_club_ratio - r.rich_density / r.overall_density) < 1e-3


def test_regex_battery(spark):
    rows = ent.queries()["fn_regex"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.vowel_runs >= 0
        assert " " not in r.snake
        assert r.is_metal in (0, 1)
        # last_word is a suffix of the snake form
        assert r.last_word == "" or r.snake.endswith(r.last_word)
