"""Scale probe (VERDICT r6 item 5): measure — don't argue — how the
slow-tail keys grow with data size.

Builds a one-off ~Nx inflated corpus from sf0.1 (disjoint-replica
construction: every fact table is replicated with key offsets so each
replica is an internally-identical, mutually-disjoint copy — the
honest analog of TPC-H scaling, where entity counts grow and densities
stay flat), runs each probed key once at base and once at Nx, and
records the measured scaling exponent log(T_N/T_1)/log(N) to
artifacts/scale_probe.json. Exponent ≈ 1 → linear; ≫ 1 → the key has
a super-linear stage and its SCALE.md rationale is wrong.

Construction details (all deterministic, no RNG):
- lineitem/orders/customer/part/supplier: keys offset by
  k * (max_key + 1) per replica k, consistently across tables so FK
  joins stay intact within a replica. nation/region untouched (FKs to
  them are preserved verbatim).
- events: event_id and user_id offset per replica (user_id stays
  inside the customer key range).
- documents: doc_id offset; text passed through a per-replica
  character substitution (translate over 2x5 letters → 10 distinct
  alphabets) that preserves token boundaries, lengths, and the
  *internal* dup/near-dup structure of each replica while keeping
  replicas mutually non-duplicate — so dedup keys see the same dup
  RATE at Nx, not an inflated one.
- embeddings: vec_id offset; each element shifted by k*1e-3 so twin
  vectors across replicas don't collapse distance structure.

Usage:
    python tools/scale_probe.py [--factor 10] [--keys k1,k2,...]
        [--rebuild]   # force data regeneration
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
OUT_JSON = "/root/repo/artifacts/scale_probe.json"
DATA_ROOT = "/root/repo/artifacts/scale_probe_data"

# The >3s tail from artifacts/bench_all.json plus the dedup/ANN
# flagships the verdict calls out. Every key here reads only tables
# the inflation covers.
DEFAULT_KEYS = [
    "graph_kcore_peel",
    "ts_resample_interp",
    "graph_khop_reach",
    "graph_assortativity",
    "fn_math2",
    "profile_lineitem",
    "llm_greedy_coverage",
    "llm_dedup_editdist",
    "llm_sim_ivf",
    "llm_dedup_cc",
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_dedup_jaccard",
    "llm_dedup_jaccard_prefix",
    "llm_dedup_simhash",
    "llm_dedup_simhash_banded",
    "llm_sim_topk",
    "llm_text_stats",
    "vec_hubness",
    "vec_two_nn_dim",
]

_VOWELS = "aeiou"
_CONS = "bcdfg"


def _alphabet(k: int) -> tuple[str, str]:
    """Per-replica character substitution: rotate vowels by k%5 and a
    consonant block by k//5 — 10 distinct, length-preserving maps;
    k=0 is the identity."""
    r1, r2 = k % 5, k // 5 % 5
    return (
        _VOWELS + _CONS,
        _VOWELS[r1:] + _VOWELS[:r1] + _CONS[r2:] + _CONS[:r2],
    )


def build_inflated(factor: int, rebuild: bool = False) -> str:
    import duckdb

    out_dir = f"{DATA_ROOT}/x{factor}"
    marker = f"{out_dir}/.complete"
    if os.path.exists(marker) and not rebuild:
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    con = duckdb.connect()
    mx = {}
    for t, key in [
        ("orders", "o_orderkey"), ("customer", "c_custkey"),
        ("part", "p_partkey"), ("supplier", "s_suppkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        mx[t] = con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{BASE}/{t}.parquet')"
        ).fetchone()[0]
    mx["user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM read_parquet('{BASE}/events.parquet')"
    ).fetchone()[0]

    def emit(table: str, select_for_k) -> None:
        parts = [select_for_k(k) for k in range(factor)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"  built {table}.parquet x{factor}", flush=True)

    src = lambda t: f"read_parquet('{BASE}/{t}.parquet')"

    emit("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * mx['orders']} AS l_orderkey,
               l_partkey + {k * mx['part']} AS l_partkey,
               l_suppkey + {k * mx['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}""")
    emit("orders", lambda k: f"""
        SELECT o_orderkey + {k * mx['orders']} AS o_orderkey,
               o_custkey + {k * mx['customer']} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM {src('orders')}""")
    emit("customer", lambda k: f"""
        SELECT c_custkey + {k * mx['customer']} AS c_custkey,
               * EXCLUDE (c_custkey)
        FROM {src('customer')}""")
    emit("part", lambda k: f"""
        SELECT p_partkey + {k * mx['part']} AS p_partkey,
               * EXCLUDE (p_partkey)
        FROM {src('part')}""")
    emit("supplier", lambda k: f"""
        SELECT s_suppkey + {k * mx['supplier']} AS s_suppkey,
               * EXCLUDE (s_suppkey)
        FROM {src('supplier')}""")
    emit("events", lambda k: f"""
        SELECT event_id + {k * mx['events']} AS event_id, ts,
               user_id + {k * mx['user']} AS user_id,
               event_type, value, props
        FROM {src('events')}""")

    def doc_sel(k: int) -> str:
        a, b = _alphabet(k)
        return f"""
        SELECT doc_id + {k * mx['documents']} AS doc_id,
               translate(text, '{a}', '{b}') AS text,
               lang, source, n_chars
        FROM {src('documents')}"""

    emit("documents", doc_sel)
    emit("embeddings", lambda k: f"""
        SELECT vec_id + {k * mx['embeddings']} AS vec_id,
               CAST(list_transform(embedding, x -> x + {k} * 1e-3)
                    AS FLOAT[]) AS embedding,
               label
        FROM {src('embeddings')}""")

    for t in ("region", "nation"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    con.close()
    open(marker, "w").write("ok\n")
    return out_dir


def _write(factor: int, results: dict) -> None:
    # merge with any prior run at the same factor so a --keys re-probe
    # of one fixed key updates its row instead of dropping the rest
    merged: dict = {}
    if os.path.exists(OUT_JSON):
        try:
            prior = json.load(open(OUT_JSON))
            if prior.get("factor") == factor:
                merged = prior.get("keys", {})
        except Exception:
            pass
    merged.update(results)
    out = {
        "base": BASE,
        "factor": factor,
        "note": "exponent = log(T_N/T_1)/log(N); median of 3 timed runs "
        "per scale after an sf0.01 warmup, cache cleared between keys; "
        "disjoint-replica corpus (see module docstring)",
        "keys": merged,
    }
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--keys", default=None)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    keys = args.keys.split(",") if args.keys else DEFAULT_KEYS

    print(f"building x{args.factor} corpus ...", flush=True)
    big_dir = build_inflated(args.factor, rebuild=args.rebuild)

    from etl_framework_spark.session import get_spark
    import __spark_entry__ as ent

    spark = get_spark("scale-probe")
    qs = ent.queries()
    results: dict[str, dict] = {}
    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    def timed_median(fn, sf: str, reps: int = 3) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            noop(fn(spark, sf))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    for key in keys:
        fn = qs[key]
        # isolate keys from each other: cached/checkpointed blocks from
        # the previous key otherwise skew single-run timings badly
        spark.catalog.clearCache()
        noop(fn(spark, "/root/testdata/sf0.01"))  # warm codegen/JIT
        t_base = timed_median(fn, BASE)
        t_big = timed_median(fn, big_dir)
        exp = math.log(max(t_big, 1e-3) / max(t_base, 1e-3)) / math.log(
            args.factor
        )
        results[key] = {
            "t_base_sec": round(t_base, 3),
            f"t_x{args.factor}_sec": round(t_big, 3),
            "exponent": round(exp, 3),
        }
        print(
            f"  {key:28s} {t_base:7.2f}s -> {t_big:7.2f}s  "
            f"exp={exp:5.2f}",
            flush=True,
        )
        _write(args.factor, results)  # incremental: survive interrupts

    print(f"wrote {OUT_JSON}")
    worst = sorted(
        results.items(), key=lambda kv: -kv[1]["exponent"]
    )[:5]
    print("highest exponents:", [(k, v["exponent"]) for k, v in worst])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
