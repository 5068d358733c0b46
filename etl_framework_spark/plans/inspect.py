"""Physical-plan inspection helpers (SURVEY.md §3.3 / §5.4 golden
plans).

`explain_str` returns what ``df.explain(mode)`` prints; tests assert
plan properties (filters pushed to the parquet scan, dims broadcast,
top-k planned as TakeOrderedAndProject, no unexpected cartesian
products) so a regression that silently de-optimizes a query fails CI
before it shows up in bench numbers.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame


def normalize_plan(plan: str) -> str:
    """Strip run-dependent noise from a formatted plan so snapshots
    diff cleanly across sessions: expression IDs (#123 — a global
    counter that depends on what ran before), plan_id tags, codegen
    ids, and absolute data paths. Structure (operators, join
    strategies, pushed filters, read schemas) is untouched — exactly
    what a golden-plan regression test should pin."""
    plan = re.sub(r"#\d+L?", "#x", plan)
    plan = re.sub(r"\blambda ([a-z]+)_\d+", r"lambda \1_n", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    plan = re.sub(r"\[codegen id : \d+\]", "[codegen id : x]", plan)
    plan = re.sub(r"file:[^\],\s]*/testdata/", "file:.../testdata/", plan)
    plan = re.sub(r"file:[^\],\s]*/(spark-warehouse|tmp)[^\],\s]*", r"file:.../\1", plan)
    return plan


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_in_plan(df: DataFrame, *needles: str, absent: tuple[str, ...] = ()) -> str:
    plan = explain_str(df)
    for needle in needles:
        assert needle in plan, f"expected {needle!r} in plan:\n{plan}"
    for needle in absent:
        assert needle not in plan, f"did NOT expect {needle!r} in plan:\n{plan}"
    return plan


def capture_plans(queries: dict, spark, sf_dir: str, out_dir: str) -> list[str]:
    """Snapshot every query's formatted plan to out_dir/<key>.txt."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for key, fn in queries.items():
        try:
            plan = normalize_plan(explain_str(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"ERROR: {e}"
        path = os.path.join(out_dir, f"{key}.txt")
        with open(path, "w") as f:
            f.write(plan)
        written.append(path)
    return written
