#!/usr/bin/env python3
"""Capture .explain('formatted') for bench registry queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_{before|after}.txt depending on --suffix.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="plans/<tag>/ output directory")
    ap.add_argument("queries", nargs="*", help="registry names (default: bench set)")
    ap.add_argument("--suffix", default="before", choices=["before", "after"])
    args = ap.parse_args()

    from clustopher_spark import get_spark
    from clustopher_spark.queries import QUERIES

    import bench

    names = args.queries or list(bench.BENCH_QUERIES)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO_ROOT, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
