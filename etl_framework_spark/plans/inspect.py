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

from pyspark.sql import DataFrame


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
            plan = explain_str(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — capture what we can
            plan = f"ERROR: {e}"
        path = os.path.join(out_dir, f"{key}.txt")
        with open(path, "w") as f:
            f.write(plan)
        written.append(path)
    return written
