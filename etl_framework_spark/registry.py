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


# ---------------------------------------------------------------------------
# Driver-head ordering (single owner — VERDICT r6 item 1, r7 item 5,
# ADVICE r7). The external driver's CORRECTNESS_r{N}.json truncates at
# the first 50 registry keys (dict insertion order): 45 pinned family
# representatives + 5 slots that rotate each round through the exact-
# oracle keys the driver has never recorded, so its own record
# accumulates coverage beyond a fixed head. queries/__init__.py calls
# finalize_head() once, after all registrations.

import glob as _glob
import hashlib as _hashlib
import json as _json
import os as _os
import re as _re

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))

N_ROTATING = 5


def current_round(repo_root: str = _REPO_ROOT) -> int:
    """The round now in progress, inferred from the committed driver
    artifacts: highest CORRECTNESS_r{N}.json + 1 (1 on a bare tree).
    Deterministic for everyone importing the same checkout."""
    rounds = [0]
    for f in _glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def driver_recorded_keys(repo_root: str = _REPO_ROOT) -> set[str]:
    """Every key that has appeared in ANY past driver record."""
    seen: set[str] = set()
    for f in _glob.glob(_os.path.join(repo_root, "CORRECTNESS_r*.json")):
        try:
            with open(f) as fh:
                seen.update(_json.load(fh).keys())
        except Exception:
            continue  # unreadable record never blocks registration
    return seen


def rotation_slots(
    pinned: list[str],
    round_no: int | None = None,
    n: int = N_ROTATING,
    repo_root: str = _REPO_ROOT,
) -> list[str]:
    """This round's rotating head slots. Pool = exact-oracle keys not
    pinned; keys already in a past driver record are deferred until
    the fresh pool is exhausted. Order = md5(key) (a fixed
    pseudorandom permutation, so consecutive rounds sample unrelated
    families); the window advances n slots per round and wraps."""
    if round_no is None:
        round_no = current_round(repo_root)
    seen = driver_recorded_keys(repo_root)
    pool = sorted(
        (k for k in QUERIES if k in ORACLES and k not in pinned),
        key=lambda k: _hashlib.md5(k.encode()).hexdigest(),
    )
    fresh = [k for k in pool if k not in seen]
    ordered = fresh + [k for k in pool if k in seen]
    if not ordered:
        return []
    off = ((round_no - 1) * n) % len(ordered)
    win = ordered[off:] + ordered[:off]
    return win[:n]


def finalize_head(pinned: list[str], n: int = N_ROTATING) -> list[str]:
    """Reorder QUERIES in place so its head is pinned + this round's
    rotation slots. Content is untouched — only dict order changes.
    Returns the head for tests/logging."""
    missing = [k for k in pinned if k not in QUERIES]
    if missing:
        raise ValueError(f"pinned head keys missing from registry: {missing}")
    head = list(pinned) + rotation_slots(pinned, n=n)
    reordered = {k: QUERIES[k] for k in head}
    reordered.update(
        (k, v) for k, v in QUERIES.items() if k not in reordered
    )
    QUERIES.clear()
    QUERIES.update(reordered)
    return head
