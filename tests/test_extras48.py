"""Invariant tests for batch 32 (lineage, retention half-life)."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def test_lineage_forms_a_dag(spark):
    rows = ent.queries()["pipeline_lineage"](spark, SF_SMALL).collect()
    assert rows
    by_rel = {r.relation: r for r in rows}
    # every non-source input references an earlier relation
    for r in rows:
        if r.input_rel is not None:
            assert r.input_rel in by_rel
            assert by_rel[r.input_rel].step_idx < r.step_idx
    # sources have no inputs
    for r in rows:
        if r.op.startswith("source:"):
            assert r.input_rel is None and r.step_idx == 0


def test_lineage_covers_arbitrary_specs():
    from etl_framework_spark.pipeline import Pipeline

    spec = {
        "sources": {"a": {"format": "parquet", "path": "/x"}},
        "steps": [
            {"name": "b", "input": "a", "op": "filter",
             "args": {"condition": "1=1"}},
            {"name": "c", "input": "b", "op": "join",
             "args": {"right": "a", "on": ["k"]}},
        ],
        "sinks": [{"input": "c", "format": "view", "name": "out"}],
    }
    rows = Pipeline(spec).lineage()
    assert [r["relation"] for r in rows] == ["a", "b", "c", "sink:view"]
    join_row = [r for r in rows if r["relation"] == "c"][0]
    assert join_row["right_rel"] == "a"
    assert rows[-1]["input_rel"] == "c"


def test_retention_halflife_consistency(spark):
    rows = ent.queries()["events_retention_halflife"](spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_points >= 3
    assert 0 < r.retention_d1 <= 1.0
    if r.retention_d7 is not None:
        assert 0 < r.retention_d7 <= 1.0
    # decaying curve → negative slope → positive half-life
    if r.decay_slope < 0:
        assert r.halflife_days > 0
