"""One-shot rename of the remaining extrasN content modules to
thematic names (VERDICT r9 items 3/4/6 — finish the round-8/9
naming-debt cleanup), plus the module-docstring pass.

Does four things, all idempotent:
1. ``git mv`` each extrasN.py with real content to its thematic name.
2. Rewrites queries/__init__.py's module list old → new.
3. Deletes the 55 round-9 back-compat shims (nothing imports the old
   names — verified by grep before running; tests were renamed in
   lockstep in r9) and records the full old→new mapping in
   queries/extras_legacy.py as a plain dict + docstring.
4. Docstring pass: every module whose docstring still opens with
   "Round-N batch M:" gets a generated first line naming the contract
   keys it registers, with the old prefix stripped from the retained
   descriptive text.

Run from /root/repo: python tools/retire_extras.py
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

QDIR = "/root/repo/etl_framework_spark/queries"

RENAMES = {
    "extras": "set_limit_sample",
    "extras2": "fn_families2",
    "extras3": "fn_families3",
    "extras4": "grouping_unpivot",
    "extras5": "mode_url_hll",
    "extras6": "recursive_lateral",
    "extras12": "skew_incremental",
    "extras13": "ts_decompose_q",
    "extras14": "feature_encode",
    "extras15": "bm25_fusion",
    "extras16": "stickiness_retention",
    "extras20": "share_collation",
    "extras21": "incremental_runs",
    "extras22": "kanon_linkpredict",
    "extras24": "weighted_median_intervals",
    "extras26": "rfm_tempsweep",
    "extras27": "rake_audio",
    "extras28": "range_bucketed",
    "extras29": "jarque_sen",
    "extras30": "srm_cms",
    "extras31": "lsh_calibration",
    "extras33": "hamming_crosscorr",
    "extras37": "bitmap_bucketed",
    "extras38": "elasticity_peaks",
    "extras39": "pruning_datacard",
    "extras40": "poisson_power_lorenz",
    "extras41": "ngrams_errorbudget",
    "extras42": "dq_observe",
    "extras43": "asof_sprt",
    "extras44": "holt_winters",
    "extras45": "tfidf_clustering",
    "extras46": "cuped_abcxyz",
    "extras47": "percentile_pruned",
    "extras48": "lineage_halflife",
    "extras49": "markov_burstiness",
    "extras50": "idgaps_heaps",
    "extras53": "geo_qq_sample",
    "extras55": "partial_bitemporal",
    "extras60": "periodogram_keys",
    "extras61": "twophase_mh",
    "extras62": "gmv_targetenc",
    "extras64": "ntile_shards",
    "extras67": "ordecomp_deming",
    "extras69": "granger_seasonal",
    "extras70": "ljungbox_maxsim",
    "extras72": "auc_growth",
    "extras74": "patterns_ppmi",
    "extras75": "cannibalization_drift",
    "extras76": "negbin_ess",
    "extras78": "cooccurrence_conformal",
    "extras79": "gumbel_fiscal",
    "extras80": "tzshift_lognormal",
    "extras83": "deadstock_funnel",
    "extras84": "fieller_silhouette",
    "extras85": "hodges_rocchio",
    "extras86": "hotelling_dispersion",
    "extras88": "casefold_grossnet",
    "extras91": "dq_sanity",
    "extras92": "mattr_participation",
    "extras95": "adamic_gwet",
    "extras100": "orc_bowker",
    "extras102": "ancova_armitage",
    "extras104": "ccc_leadtime",
    "extras109": "monotonic_hist2d",
    "extras110": "signtest_triplet",
    "extras111": "neyman_discovery",
    "extras116": "posthoc_aging",
    "extras118": "binseg_multidistinct",
    "extras119": "outage_effectsize",
    "extras121": "greenlist_gini",
    "extras124": "fingerprint_picoverage",
    "extras125": "tradingday_fertility",
    "extras126": "injection_masking",
    "extras127": "slopes_lifespan",
    "extras129": "krippendorff_eventstudy",
    "extras130": "dom_discount",
    "extras131": "vectorops_benford",
    "extras132": "stickiness_delta",
    "extras133": "positivity_xmr",
    "extras134": "anomaly_parity",
    "extras136": "weekend_quarterend",
    "extras137": "dedup_banded",
}


def git(*args: str) -> None:
    subprocess.run(["git", "-C", "/root/repo", *args], check=True)


def module_keys(path: str) -> list[str]:
    """Contract keys a module registers, from its @query("key") calls."""
    tree = ast.parse(open(path).read())
    keys: list[str] = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and getattr(node.func, "id", None) == "query"
            and node.args
            and isinstance(node.args[0], ast.Constant)
        ):
            keys.append(node.args[0].value)
    return keys


def rewrite_docstring(path: str) -> bool:
    """Replace a 'Round-N batch M:' docstring opener with a generated
    key-naming first line; keep the rest of the descriptive text."""
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree)
    if doc is None or not re.search(r"Round-\d+ batch", doc):
        return False
    keys = module_keys(path)
    if not keys:
        return False
    rest = re.sub(
        r"^Round-\d+ batch [\d.]+[^:]*:\s*", "", doc, count=1
    ).strip()
    if rest:
        rest = rest[0].upper() + rest[1:]
    import textwrap

    head = textwrap.fill(
        "Contract keys: " + ", ".join(f"``{k}``" for k in keys) + ".",
        width=72,
    )
    new_doc = head + ("\n\n" + rest if rest else "") + "\n"
    # swap only the module docstring literal (first statement)
    first = tree.body[0]
    assert isinstance(first, ast.Expr) and isinstance(first.value, ast.Constant)
    lines = src.splitlines(keepends=True)
    before = "".join(lines[: first.lineno - 1])
    after = "".join(lines[first.end_lineno :])
    open(path, "w").write(before + '"""' + new_doc + '"""' + after)
    return True


def main() -> None:
    os.chdir(QDIR)
    # 1. drop the r9 shims (≤20-line extrasN files) and record mapping
    legacy: dict[str, str] = {}
    for f in sorted(os.listdir(".")):
        m = re.fullmatch(r"(extras\d*)\.py", f)
        if not m:
            continue
        name = m.group(1)
        if sum(1 for _ in open(f)) <= 20:  # shim
            target = re.search(
                r"renamed to (\w+)", open(f).read()
            ).group(1)
            legacy[name] = target
            git("rm", "-q", f"etl_framework_spark/queries/{f}")
    # 2. rename content modules
    for old, new in RENAMES.items():
        if not os.path.exists(f"{old}.py"):
            continue
        if os.path.exists(f"{new}.py"):
            raise SystemExit(f"collision: {new}.py exists")
        git(
            "mv",
            f"etl_framework_spark/queries/{old}.py",
            f"etl_framework_spark/queries/{new}.py",
        )
        legacy[old] = new
    # 3. rewrite __init__'s module list
    init = open("__init__.py").read()
    for old, new in RENAMES.items():
        init, n = re.subn(rf'"{old}",', f'"{new}",', init, count=1)
        if n != 1:
            raise SystemExit(f"__init__ entry not found for {old}")
    open("__init__.py", "w").write(init)
    # 4. docstring pass over every module
    changed = []
    for f in sorted(os.listdir(".")):
        if f.endswith(".py") and f != "__init__.py":
            if rewrite_docstring(f):
                changed.append(f)
    # 5. write the legacy mapping note
    body = "".join(
        f'    "{o}": "{n}",\n' for o, n in sorted(legacy.items())
    )
    open("extras_legacy.py", "w").write(
        '"""Historical extrasN → thematic-module mapping (rounds 8-10\n'
        "naming-debt cleanup). The extrasN modules grew one rotation\n"
        "batch at a time in rounds 2-6; rounds 8-9 renamed 55 of them\n"
        "with back-compat shims, round 10 renamed the rest and dropped\n"
        "the shims (nothing imported the old names). This module is\n"
        "documentation only — it registers nothing and is not imported\n"
        'by the package."""\n\n'
        "EXTRAS_TO_THEMATIC = {\n" + body + "}\n"
    )
    git("add", "etl_framework_spark/queries/extras_legacy.py")
    print(f"renamed {len(RENAMES)}, docstrings rewritten in "
          f"{len(changed)} modules, legacy map {len(legacy)} entries")


if __name__ == "__main__":
    main()
