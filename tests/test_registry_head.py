"""Pin the registry's first-50 head (VERDICT r5 item 4, r6 item 1).

The external driver's CORRECTNESS_r{N}.json truncates at the first 50
registry keys (dict insertion order), so only those get the hard
per-round oracle signal. Round 6's verdict asked for the head to span
all 11 SURVEY §2 families with ZERO rows-only keys, so the driver's
own record shows 50/50 hash-checked rows. queries/__init__.py now
reorders the registry explicitly (_DRIVER_HEAD); this test freezes
that head. If this test fails, _DRIVER_HEAD drifted or a core key was
renamed.
"""

from __future__ import annotations

import etl_framework_spark.queries  # noqa: F401 — triggers registration
from etl_framework_spark.registry import ORACLES, QUERIES

# The canonical head: every SURVEY §2 family (S/P/J/O/U/A/W/F/T/X/L)
# represented, every key carrying an exact DuckDB oracle. Evicted from
# the r5 head: agg_approx_distinct, fn_hash_native,
# llm_dedup_minhash_fast (rows-only by design → zero driver signal),
# llm_simhash (scorer twin of llm_dedup_simhash), agg_cube (same §2
# row as agg_rollup). All five stay registered and oracle-swept
# locally — only their driver-head slots moved.
EXPECTED_HEAD = [
    "scan_parquet", "project_expr", "filter_pred", "case_when",
    "distinct_proj",
    "join_inner", "join_outer", "join_semi", "join_anti",
    "join_broadcast", "join_cross", "join_range", "join_interval",
    "join_star", "join_asof",
    "topk", "set_union_all", "set_union", "set_intersect", "set_except",
    "agg_groupby", "agg_global", "agg_count_distinct", "agg_rollup",
    "agg_conditional", "agg_collect", "agg_median", "agg_stats",
    "agg_pivot",
    "win_rank", "win_lag_lead", "win_running_sum", "win_moving_avg",
    "win_range_frame", "win_topk_group",
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_map", "fn_json",
    "fn_hash",
    "stream_tumbling", "stream_session",
    "udaf_geomean",
    "llm_dedup_exact", "llm_dedup_minhash", "llm_dedup_jaccard",
    "llm_dedup_simhash", "llm_sim_topk",
]


def test_head_is_pinned() -> None:
    assert list(QUERIES)[:50] == EXPECTED_HEAD


def test_head_oracle_coverage() -> None:
    """Every head key carries an exact DuckDB oracle (r6 item 1: the
    driver's 50-row record must contain zero no_oracle rows)."""
    for key in EXPECTED_HEAD:
        assert ORACLES.get(key), f"head key {key} lost its oracle"


def test_evicted_keys_still_registered() -> None:
    """Head eviction must not remove keys from the contract surface."""
    for key in (
        "agg_approx_distinct", "fn_hash_native", "llm_dedup_minhash_fast",
        "llm_simhash", "agg_cube",
    ):
        assert key in QUERIES, f"evicted head key {key} fell out of registry"


def test_readme_counts_match_registry() -> None:
    """README's headline key/oracle counts must track the registry
    (ADVICE r5: stale counts shipped twice). The claim line is
    '(current: N contract keys / M exact oracles)'."""
    n_keys = len(QUERIES)
    n_oracles = sum(1 for k in QUERIES if ORACLES.get(k))
    with open("/root/repo/README.md") as f:
        readme = f.read()
    assert f"{n_keys} contract keys / {n_oracles} exact oracles" in readme, (
        f"README count line stale: registry has {n_keys} keys / "
        f"{n_oracles} oracles"
    )
