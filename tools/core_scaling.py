#!/usr/bin/env python3
"""Strong-scaling (core-count) panel: wall clock vs local[N] parallelism.

SCALING_r{N} measures how wall grows with DATA at fixed cores (the
100 TB data axis).  This tool measures the other axis of the cluster
story: how wall shrinks with CORES at fixed data (sf0.1) — the proxy
for "does this operator actually use a 1000-executor cluster, or is it
secretly serialized on the driver / a single partition?".  A key whose
wall is flat from local[4] to local[32] is bottlenecked on something
parallelism can't buy: driver-side work, a SinglePartition exchange, a
broadcast build, or fixed scheduling cost.

For each N in (4, 16, 32): a fresh session (master can't change inside
a live SparkContext), the bench warm-up, then each panel key executed
into the noop sink (same timing contract as bench.py), canary-bracketed.
Writes ``CORE_SCALING_r{NN}.json`` with per-key walls, the 4->32
speedup, and parallel efficiency (speedup / core-ratio).

Panel: the scale-critical families (dedup/ANN/graph/corpus) plus one
cheap scan-shaped key as the fixed-cost yardstick — a key's true
parallel speedup is better read AFTER subtracting the yardstick's
fixed scheduling floor, so the artifact records both raw and
floor-adjusted efficiency.

Run from the repo root:  python tools/core_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORES = (4, 16, 32)

PANEL = [
    "projection",           # scan-shaped yardstick: ~pure fixed cost
    "pricing_summary",
    "nation_revenue",
    "window_agg_events",
    "text_tfidf",
    "curate_corpus",
    "corpus_pipeline",
    "dedup_minhash_lsh",
    "dedup_pipeline_lsh",
    "dedup_exact",
    "semdedup",
    "simsearch_topk",
    "knn_graph",
    "pagerank",
    "graph_triangles",
]


def main() -> None:
    from parquet_merger_spark.queries import QUERIES
    from parquet_merger_spark.session import first_touch_canary_s, get_spark

    canary_before = first_touch_canary_s()
    walls: dict[str, dict[str, float]] = {k: {} for k in PANEL}
    for n in CORES:
        spark = get_spark(f"pm-core-scaling-{n}", cpus=n)
        spark.sparkContext.setLogLevel("ERROR")
        # bench.py's warm-up: fault the IO path + fork all python workers
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
        spark.range(0, n, 1, n).mapInPandas(lambda it: it, "id long").count()
        for key in PANEL:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[key](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[key][str(n)] = round(time.perf_counter() - t0, 3)
            print(f"local[{n}] {key}: {walls[key][str(n)]}s", flush=True)
        spark.stop()
    canary_after = first_touch_canary_s()

    lo, hi = str(CORES[0]), str(CORES[-1])
    ratio = CORES[-1] / CORES[0]
    floor_lo, floor_hi = walls["projection"][lo], walls["projection"][hi]
    out: dict[str, dict] = {}
    for key in PANEL:
        w = walls[key]
        speedup = round(w[lo] / w[hi], 2) if w[hi] else None
        adj_lo = max(w[lo] - floor_lo, 1e-9)
        adj_hi = max(w[hi] - floor_hi, 1e-9)
        out[key] = {
            "wall_s": w,
            "speedup_4_to_32": speedup,
            "efficiency": round(speedup / ratio, 2) if speedup else None,
            # fixed-cost floor subtracted (projection's wall at each N):
            # the efficiency of the key's OWN data-parallel work
            "efficiency_floor_adj": (
                round((adj_lo / adj_hi) / ratio, 2) if key != "projection" else None
            ),
        }

    from parquet_merger_spark.oracle import next_round

    artifact = {
        "sf_dir": SF_DIR,
        "cores": list(CORES),
        "host_canary_s": {"before": canary_before, "after": canary_after},
        "canary_ok": bool(max(canary_before, canary_after) < 1.0),
        "keys": out,
    }
    n = next_round(ROOT)
    path = os.path.join(ROOT, f"CORE_SCALING_r{n:02d}.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"\n{path} written")


if __name__ == "__main__":
    main()
