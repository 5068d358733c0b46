"""Unit tests for tools/scale_probe.py's pure pieces (no Spark).

The probe's artifact integrity matters: a --keys re-probe once
overwrote the full 19-key record because _write replaced instead of
merging. These tests pin the merge behavior and the corpus
construction invariants.
"""

from __future__ import annotations

import importlib.util
import json
import sys


def _load():
    spec = importlib.util.spec_from_file_location(
        "scale_probe", "/root/repo/tools/scale_probe.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scale_probe"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_alphabet_maps_are_distinct_and_length_preserving():
    sp = _load()
    seen = set()
    for k in range(10):
        a, b = sp._alphabet(k)
        assert len(a) == len(b)  # translate() preserves length
        assert sorted(a) == sorted(b)  # a permutation, not a lossy map
        seen.add(b)
    assert len(seen) == 10  # 10 distinct per-replica transforms
    assert sp._alphabet(0)[0] == sp._alphabet(0)[1]  # k=0 is identity


def test_write_merges_partial_reprobes(tmp_path, monkeypatch):
    sp = _load()
    out = tmp_path / "scale_probe.json"
    monkeypatch.setattr(sp, "OUT_JSON", str(out))
    sp._write(10, {"a": {"exponent": 1.0}, "b": {"exponent": 0.5}})
    # a --keys re-probe of just 'a' must update 'a' and KEEP 'b'
    sp._write(10, {"a": {"exponent": 0.9}})
    got = json.load(open(out))
    assert got["keys"]["a"]["exponent"] == 0.9
    assert got["keys"]["b"]["exponent"] == 0.5
    # a different factor starts fresh (exponents aren't comparable)
    sp._write(2, {"c": {"exponent": 0.1}})
    got = json.load(open(out))
    assert set(got["keys"]) == {"c"} and got["factor"] == 2
