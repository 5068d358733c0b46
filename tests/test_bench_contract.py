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
    required = {
        "metric", "value", "unit", "queries", "calibration", "sf",
        # r12 (VERDICT r11 item 2): the line must echo the env it ran
        # under so the driver's scaling heuristic can key on cpus
        "cpus", "sf_dir",
    }
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


def test_bench_all_median_is_symmetric() -> None:
    """ADVICE r10 items 2-3: the retime estimator is median-of-all-
    samples (symmetric — cannot only lower the record the way
    min-of-medians could)."""
    import tools.bench_all as ba

    assert ba.median([3.0, 1.0, 2.0]) == 2.0
    assert ba.median([1.0, 2.0, 3.0, 10.0]) == 2.5
    # a burst in the FIRST pass is voted out by the second...
    assert ba.median([9.0, 9.5, 9.2] + [1.0, 1.1, 1.2]) < 6
    # ...and a genuinely slow key cannot dip under noise: one lucky
    # fast sample in the second pass does not drag the merged median
    # below the true plateau
    assert ba.median([5.0, 5.1, 5.2] + [0.5, 5.0, 5.1]) >= 5.0


def test_bench_all_prior_requires_matching_sf(tmp_path) -> None:
    """ADVICE r10 item 3: a prior artifact taken at a different scale
    factor must not seed the suspect thresholds. Source-level check:
    the guard exists and gates prior_times."""
    import inspect

    import tools.bench_all as ba

    src = inspect.getsource(ba.main)
    assert 'prior.get("sf_dir") == args.sf' in src
