"""Query/oracle registry — the SURVEY.md §2 contract surface.

Every implemented operator registers a callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) a DuckDB oracle SQL string.
``__spark_entry__.queries()`` / ``oracle_sql()`` re-export these dicts.

Oracle-equality discipline (SURVEY.md §5.3): alias every computed
column identically on both sides; total order for any rank/top-k;
round floats where aggregation order can change low bits; truncate
events.ts (ns in parquet) before exposing/comparing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``key``.

    ``oracle`` is the equivalent DuckDB SQL (ANSI, over the
    pre-registered views); omit for non-SQL-expressible ops —
    the driver then records a weaker rows-only check.
    """

    def deco(fn: Callable) -> Callable:
        if key in QUERIES:
            raise ValueError(f"duplicate query key {key!r}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = " ".join(oracle.split())
        return fn

    return deco
