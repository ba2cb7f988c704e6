#!/usr/bin/env python3
"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r14 --suffix _before \
        [--only name1,name2] [--sf-dir /root/testdata/sf0.1]

Driver-side only (no jobs run); plans are the pre-execution AQE plans
(`AdaptiveSparkPlan isFinalPlan=false`), which is what the plan-shape
claims in OPTIMIZATION_r14.md reference.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import bench
    from stglib_spark import queries as registry
    from stglib_spark.session import get_spark

    names = bench.HEADLINE + bench.E2E_STAGE
    if args.only:
        names = args.only.split(",")

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
