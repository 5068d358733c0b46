"""Static contract checks for bench.py (VERDICT r8 item 3): the
driver parses its single JSON line, and cross-round comparison now
depends on the ``calibration`` denominator — pin both without paying
a full bench run in the test suite.
"""

from __future__ import annotations

import ast
import pathlib

BENCH = pathlib.Path(__file__).resolve().parents[1] / "bench.py"


def test_bench_emits_required_fields() -> None:
    """The json.dumps payload must carry every key the driver and the
    BASELINE.md normalization rule consume. Parsed from the AST so the
    test can't drift from the source."""
    tree = ast.parse(BENCH.read_text())
    dict_keys: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            dict_keys.update(
                k.value for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            )
    required = {"metric", "value", "unit", "queries", "calibration", "sf"}
    missing = required - dict_keys
    assert not missing, f"bench.py payload lost fields: {sorted(missing)}"


def test_bench_calibration_is_registry_independent() -> None:
    """The calibration workload must not touch the registry or the
    testdata — it is a machine-state denominator, valid even when a
    query implementation changes. Enforced textually: the cal_run body
    uses spark.range, not qs[...] or sf_dir."""
    tree = ast.parse(BENCH.read_text())
    cal = None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "cal_run":
            cal = ast.unparse(node)
    assert cal is not None, "bench.py lost its cal_run workload"
    assert "spark.range" in cal
    assert "qs[" not in cal and "sf_dir" not in cal
