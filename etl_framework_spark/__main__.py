"""CLI entry point — run a config-file job, the reference family's
operating model (`spark-submit`-able):

    python -m etl_framework_spark job.yaml [job2.json ...] [--summary]

Each job file is compiled and executed end-to-end (sources → steps →
sinks, including observe()-based sink validation); with --summary a
per-relation row count prints after each job (costs extra actions).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_framework_spark")
    ap.add_argument("jobs", nargs="+", help="job spec files (.json/.yaml)")
    ap.add_argument(
        "--summary",
        action="store_true",
        help="also print a row count per materialized relation (extra actions)",
    )
    args = ap.parse_args(argv)

    from etl_framework_spark.pipeline import run_pipeline_file
    from etl_framework_spark.session import get_spark

    spark = get_spark("etl-framework-job")
    rc = 0
    for path in args.jobs:
        t0 = time.time()
        try:
            rel = run_pipeline_file(spark, path)
        except Exception as e:  # noqa: BLE001 — report and continue to next job
            print(f"[FAIL] {path}: {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        took = time.time() - t0
        print(f"[OK] {path}: {len(rel)} relations in {took:.1f}s")
        if args.summary:
            for name, df in rel.items():
                print(f"       {name}: {df.count()} rows")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
