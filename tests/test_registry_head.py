"""Pin the registry's driver head (VERDICT r5 item 4, r6 item 1, r7
item 5).

The external driver's CORRECTNESS_r{N}.json truncates at the first 50
registry keys (dict insertion order), so only those get the hard
per-round oracle signal. The head is 45 PINNED family representatives
(all 11 SURVEY §2 families, exact DuckDB oracles only) plus 5 slots
that registry.rotation_slots() rotates each round through exact-oracle
keys no past driver record has seen. This test freezes the 45 and
re-derives the rotation with the same public rule — if it fails,
either the pinned list drifted, a core key was renamed, or the
rotation stopped being deterministic.
"""

from __future__ import annotations

import re

import etl_framework_spark.queries as q  # noqa: F401 — triggers registration
from etl_framework_spark.queries import DRIVER_HEAD_PINNED
from etl_framework_spark.registry import (
    ORACLES,
    QUERIES,
    driver_recorded_keys,
    rotation_slots,
)

# The canonical pinned head: every SURVEY §2 family (S/P/J/O/U/A/W/F/
# T/X/L) represented, every key carrying an exact DuckDB oracle.
# Demoted to the rotation pool in r8 (all already green in a past
# driver record): join_cross, set_union_all, agg_conditional,
# win_moving_avg, fn_math. Evicted in r5/r6 and still registered:
# agg_approx_distinct, fn_hash_native, llm_dedup_minhash_fast,
# llm_simhash, agg_cube.
EXPECTED_PINNED = [
    "scan_parquet", "project_expr", "filter_pred", "case_when",
    "distinct_proj",
    "join_inner", "join_outer", "join_semi", "join_anti",
    "join_broadcast", "join_range", "join_interval",
    "join_star", "join_asof",
    "topk", "set_union", "set_intersect", "set_except",
    "agg_groupby", "agg_global", "agg_count_distinct", "agg_rollup",
    "agg_collect", "agg_median", "agg_stats", "agg_pivot",
    "win_rank", "win_lag_lead", "win_running_sum",
    "win_range_frame", "win_topk_group",
    "fn_string", "fn_date", "fn_array", "fn_map", "fn_json",
    "fn_hash",
    "stream_tumbling", "stream_session",
    "udaf_geomean",
    "llm_dedup_exact", "llm_dedup_minhash", "llm_dedup_jaccard",
    "llm_dedup_simhash", "llm_sim_topk",
]


def test_pinned_head_is_frozen() -> None:
    assert DRIVER_HEAD_PINNED == EXPECTED_PINNED
    assert list(QUERIES)[:45] == EXPECTED_PINNED


def test_rotation_slots_fill_the_head() -> None:
    """head[45:50] must equal the deterministic rotation for the
    current round: 5 exact-oracle keys, none pinned, and — while the
    fresh pool lasts — none seen in any past driver record."""
    head = list(QUERIES)[:50]
    rot = head[45:]
    assert rot == rotation_slots(EXPECTED_PINNED)
    assert len(rot) == len(set(rot)) == 5
    assert not set(rot) & set(EXPECTED_PINNED)
    for key in rot:
        assert ORACLES.get(key), f"rotating key {key} has no exact oracle"
    seen = driver_recorded_keys()
    fresh_pool = [
        k for k in QUERIES
        if k in ORACLES and k not in EXPECTED_PINNED and k not in seen
    ]
    if len(fresh_pool) >= 5:
        assert not set(rot) & seen, (
            "rotation picked already-driven keys while fresh ones remain"
        )


def test_head_oracle_coverage() -> None:
    """Every head key carries an exact DuckDB oracle (r6 item 1: the
    driver's 50-row record must contain zero no_oracle rows)."""
    for key in list(QUERIES)[:50]:
        assert ORACLES.get(key), f"head key {key} lost its oracle"


def test_demoted_keys_still_registered() -> None:
    """Head demotion/eviction must not remove keys from the contract."""
    for key in (
        "join_cross", "set_union_all", "agg_conditional", "win_moving_avg",
        "fn_math",
        "agg_approx_distinct", "fn_hash_native", "llm_dedup_minhash_fast",
        "llm_simhash", "agg_cube",
    ):
        assert key in QUERIES, f"demoted key {key} fell out of registry"


def _headline_counts() -> tuple[int, int]:
    n_keys = len(QUERIES)
    n_oracles = sum(1 for k in QUERIES if ORACLES.get(k))
    return n_keys, n_oracles


def test_readme_counts_match_registry() -> None:
    """README's headline key/oracle counts must track the registry
    (ADVICE r5: stale counts shipped twice). The claim line is
    '(current: N contract keys / M exact oracles)'."""
    n_keys, n_oracles = _headline_counts()
    with open("/root/repo/README.md") as f:
        readme = f.read()
    assert f"{n_keys} contract keys / {n_oracles} exact oracles" in readme, (
        f"README count line stale: registry has {n_keys} keys / "
        f"{n_oracles} oracles"
    )


def test_coverage_md_counts_match_registry() -> None:
    """COVERAGE.md's headline counts must track the registry too
    (VERDICT r7 item 7: its header shipped stale while only README was
    tested). COVERAGE.md states the same canonical count line, and
    (r8 item 2) its rows-only sentence must equal n_keys − n_oracles
    and its arithmetic line must spell out the same subtraction."""
    n_keys, n_oracles = _headline_counts()
    with open("/root/repo/COVERAGE.md") as f:
        cov = f.read()
    assert f"{n_keys} contract keys / {n_oracles} exact oracles" in cov, (
        f"COVERAGE.md count line stale: registry has {n_keys} keys / "
        f"{n_oracles} oracles"
    )
    n_rows_only = n_keys - n_oracles
    assert f"{n_rows_only} keys are\nrows-only by design" in cov, (
        f"COVERAGE.md rows-only sentence stale: registry implies "
        f"{n_rows_only} rows-only keys"
    )
    assert f"({n_rows_only} = {n_keys} − {n_oracles})" in cov, (
        "COVERAGE.md rows-only arithmetic line stale"
    )


def test_rotation_exhausts_fresh_pool_before_repeat() -> None:
    """Forward-simulate the rotation to pool exhaustion (ADVICE r8
    medium): starting from the committed driver records, repeatedly
    take this round's slots and mark them recorded. Every round's
    slots must be entirely fresh until the fresh pool is exhausted —
    the old (round−1)·n offset violated this around round 59."""
    seen = set(driver_recorded_keys())
    pool = {
        k for k in QUERIES
        if k in ORACLES and k not in EXPECTED_PINNED
    }
    rounds = 0
    while pool - seen:
        slots = rotation_slots(EXPECTED_PINNED, seen=seen)
        fresh = pool - seen
        take = min(len(fresh), len(slots))
        assert set(slots[:take]) <= fresh, (
            f"simulated round {rounds} picked a recorded key while "
            f"{len(fresh)} fresh keys remain: {slots}"
        )
        seen.update(slots)
        rounds += 1
        assert rounds < 10_000, "rotation failed to converge"
    # exhausted pool still yields n slots (now legitimately repeats)
    assert len(rotation_slots(EXPECTED_PINNED, seen=seen)) == 5


def _committed_record_names() -> list[str]:
    """CORRECTNESS_r*.json names in the HEAD tree — derived with git
    directly (not via registry._record_files) so a helper regression
    can't mask a repeat, but from the SAME source of truth the
    rotation uses: the commit, not the working tree (VERDICT r9 item
    1: the old glob included the driver's still-uncommitted record,
    whose keys by construction EQUAL the current slots, so the test
    went red on every mid-round tree)."""
    import re as _re
    import subprocess

    out = subprocess.run(
        ["git", "-C", "/root/repo", "ls-tree", "HEAD", "--name-only"],
        capture_output=True,
        text=True,
        timeout=10,
        check=True,
    )
    return [
        f for f in out.stdout.splitlines()
        if _re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    ]


def test_rotation_disjoint_from_all_committed_records() -> None:
    """VERDICT r8 item 5 (re-scoped per VERDICT r9 item 1): while ≥5
    fresh keys remain, the 5 rotation slots must be disjoint from
    every key in every COMMITTED CORRECTNESS_r*.json."""
    import json

    recorded: set[str] = set()
    for name in sorted(_committed_record_names()):
        with open(f"/root/repo/{name}") as fh:
            recorded.update(json.load(fh).keys())
    fresh_pool = [
        k for k in QUERIES
        if k in ORACLES and k not in EXPECTED_PINNED and k not in recorded
    ]
    slots = rotation_slots(EXPECTED_PINNED)
    if len(fresh_pool) >= 5:
        assert not set(slots) & recorded, (
            f"rotation repeats recorded keys with {len(fresh_pool)} "
            f"fresh remaining: {sorted(set(slots) & recorded)}"
        )


def test_untracked_record_keys_equal_current_head() -> None:
    """Companion for the mid-round window (VERDICT r9 item 1): a
    CORRECTNESS record present on disk but absent from HEAD is the
    driver's record OF this head, so its keys must be exactly the
    current 50-key head (pinned + current slots). Trivially passes
    once the record is committed."""
    import glob
    import json
    import os

    committed = set(_committed_record_names())
    head = set(list(QUERIES)[:50])
    for f in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        name = os.path.basename(f)
        if name in committed:
            continue
        with open(f) as fh:
            keys = set(json.load(fh).keys())
        assert keys == head, (
            f"uncommitted {name} keys diverge from the current head: "
            f"missing={sorted(head - keys)[:5]} "
            f"extra={sorted(keys - head)[:5]}"
        )


def test_recorded_keys_read_committed_content_not_working_tree() -> None:
    """ADVICE r10 item 1: _record_files pins the record NAME set to
    HEAD, but key content must also come from HEAD — an (uncommitted)
    edit to an already-committed CORRECTNESS_r*.json must not shift
    the rotation head."""
    import json
    import shutil

    from etl_framework_spark.registry import driver_recorded_keys

    target = "/root/repo/CORRECTNESS_r01.json"
    backup = target + ".bak_test"
    before = driver_recorded_keys()
    assert before, "expected committed driver records"
    shutil.copy(target, backup)
    try:
        with open(target) as fh:
            doc = json.load(fh)
        doc["__tampered_key__"] = {"rows_match": True}
        with open(target, "w") as fh:
            json.dump(doc, fh)
        after = driver_recorded_keys()
    finally:
        shutil.move(backup, target)
    assert "__tampered_key__" not in after
    assert after == before
