#!/usr/bin/env python3
"""Dump ``.explain("formatted")`` for named contract keys to
``plans/<tag>/<key>_<suffix>.txt`` — the before/after plan evidence an
optimization round commits alongside the code.

Usage:  python tools/dump_plans.py --tag r10 --suffix before key1 key2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--suffix", required=True, choices=["before", "after"])
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    from parquet_merger_spark.queries import QUERIES
    from parquet_merger_spark.session import get_spark

    unknown = [k for k in args.keys if k not in QUERIES]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pm-dump-plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(ROOT, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    for name in args.keys:
        spark.catalog.clearCache()
        df = QUERIES[name](spark, SF_DIR)
        # capture the formatted plan text instead of letting explain()
        # print to stdout
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name} -> {path}", flush=True)


if __name__ == "__main__":
    main()
