"""Time EVERY contract query at a scale factor (default sf0.1) with
the noop sink and write artifacts/bench_all.json — the self-measured
per-operator baseline SURVEY §6 calls for. One untimed warmup then
median of 3 per key (JIT/GC noise dominates single local runs).

Usage: python tools/bench_all.py [--sf DIR] [--out PATH] [--keys k1,k2]

--keys re-times only the named keys and MERGES them into the existing
artifact (for refreshing rows whose implementation changed without a
25-minute full sweep; the full sweep remains the per-round gate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/artifacts/bench_all.json")
    ap.add_argument("--keys", default=None, help="comma-separated subset")
    args = ap.parse_args()

    from etl_framework_spark.session import get_spark
    import __spark_entry__ as ent

    spark = get_spark("bench_all")
    qs = ent.queries()

    def run(key: str) -> float:
        t0 = time.time()
        qs[key](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def release_blocks() -> None:
        # clearCache drops DataFrame caches but NOT RDDs pinned by
        # localCheckpoint (iterative graph keys) or per-call persist()
        # — without this, blocks accumulate across the 615-key sweep
        # and depress later keys (same fix as tools/scale_probe.py;
        # the r8 sweep measured graph_khop_reach at 22.7 s in-sweep
        # vs 7.3 s isolated before this cleanup existed).
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist(False)
        except Exception:
            pass

    run("agg_groupby")  # session warmup, untimed
    times: dict[str, float] = {}
    failures: dict[str, str] = {}
    subset = args.keys.split(",") if args.keys else None
    if subset:
        missing = [k for k in subset if k not in qs]
        if missing:
            raise SystemExit(f"unknown keys: {missing}")
        # merge mode: start from the existing artifact's rows
        if os.path.exists(args.out):
            try:
                prior = json.load(open(args.out))
                times.update(prior.get("queries", {}))
                failures.update(prior.get("failures", {}))
            except Exception:
                pass
        for k in subset:
            failures.pop(k, None)
    for key in subset or sorted(qs):
        release_blocks()
        try:
            # same methodology as bench.py: one untimed warmup (plan
            # compile + codegen), then median of 3 — min-of-2 was still
            # showing multi-second GC-pause outliers on sub-second keys
            run(key)
            times[key] = round(sorted(run(key) for _ in range(3))[1], 3)
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            failures[key] = str(e)[:200]
        print(f"{key:28s} {times.get(key, 'FAIL')}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {
        "sf_dir": args.sf,
        "n_queries": len(times),
        "total_sec": round(sum(times.values()), 3),
        "queries": dict(sorted(times.items(), key=lambda kv: -kv[1])),
        "failures": failures,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total_sec": payload["total_sec"], "n": len(times),
                      "failures": len(failures)}))


if __name__ == "__main__":
    main()
