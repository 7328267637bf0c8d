#!/usr/bin/env python3
"""Triangles shuffle-partition hint probe (r09 ask #6).

r08 root-caused the graph_triangles core "inversion" (32 cores slower
than 16) as a PARTITION-COUNT effect: the heavy stages are
allocation-bound (collect_list arrays + array_intersect transients), so
32 shuffle partitions just multiply allocation pressure — 32c/16p ran
at parity with 16c/16p at both sf1 and sf10.  r09 promoted the finding
into the operator: ``triangle_count(..., shuffle_partitions=N)``.

This probe demonstrates the hint closes the inversion where a user
would hit it: same 32-core session, hint off (session default = 32
partitions) vs hint 16, plus a 16-core control session, on the sf1
co-purchase graph.  Writes TRIANGLES_HINT_r{N}.json.

Run from the repo root:  python tools/triangles_hint_probe.py
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF", os.path.join(ROOT, ".localdata/sf1"))
REPS = int(os.environ.get("SPARK_GRAFT_HINT_REPS", "3"))


def _edges(spark, sf_dir):
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
    )


def _run(cpus: int, hint: int | None) -> dict:
    import subprocess

    # a fresh SESSION per point in its own subprocess keeps block-manager
    # state from leaking between measurements (the r08 probe methodology)
    code = f"""
import sys, time
sys.path.insert(0, {ROOT!r})
sys.path.insert(0, {ROOT!r} + '/tools')
from parquet_merger_spark.session import get_spark
from triangles_hint_probe import _edges
from parquet_merger_spark.operators.graph import triangle_count
spark = get_spark("tri-hint", cpus={cpus})
spark.sparkContext.setLogLevel("ERROR")
walls = []
for _ in range({REPS}):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    row = triangle_count(_edges(spark, {SF_DIR!r}), shuffle_partitions={hint!r}).collect()[0]
    walls.append(round(time.perf_counter() - t0, 2))
print("WALLS", walls, row.n_triangles)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    import ast

    line = [l for l in out.stdout.splitlines() if l.startswith("WALLS")][0]
    parts = line.split()
    walls = ast.literal_eval(" ".join(parts[1:-1]))
    return {
        "cpus": cpus,
        "hint": hint,
        "walls_s": walls,
        "best_s": min(walls),
        "n_triangles": int(parts[-1]),
    }


def main() -> None:
    from parquet_merger_spark.session import first_touch_canary_s

    canary_before = first_touch_canary_s()
    points = [
        _run(32, None),  # session default: 32 shuffle partitions
        _run(32, 16),  # the hint at the r08-measured best
        _run(16, None),  # 16-core control (16 partitions by default)
    ]
    tri = {p["n_triangles"] for p in points}
    assert len(tri) == 1, f"census disagrees across points: {tri}"
    result = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "host_canary_s": {
            "before": canary_before,
            "after": first_touch_canary_s(),
        },
        "points": points,
        "inversion_closed": points[1]["best_s"] <= points[2]["best_s"] * 1.05,
    }
    from parquet_merger_spark.oracle import next_round

    n = next_round(ROOT)
    path = os.path.join(ROOT, f"TRIANGLES_HINT_r{n:02d}.json")
    from artifact import write_artifact

    moved = write_artifact(path, result, indent=1)
    if moved:
        print(f"# previous artifact preserved at {moved}")
    import json

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
