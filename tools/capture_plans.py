"""Snapshot every contract query's formatted physical plan to
artifacts/plans/<key>.txt (SURVEY.md §3.3) for optimizer-behavior
review and regression diffing.

Usage: python tools/capture_plans.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/root/repo/artifacts/plans")
    args = ap.parse_args()

    from etl_framework_spark.session import get_spark
    from etl_framework_spark.plans import capture_plans
    import __spark_entry__ as ent

    spark = get_spark("capture-plans")
    written = capture_plans(ent.queries(), spark, args.sf, args.out)
    print(f"wrote {len(written)} plans to {args.out}")


if __name__ == "__main__":
    main()
