#!/usr/bin/env python3
"""Root-cause rig for the FIRST-HEAVY-KEY session tax (r10 verdict #2).

Runs a fresh session, an optional extra warm-up stage, then the given
keys once each in order (bench.py methodology: clearCache, build +
noop-sink timed together), printing per-key seconds plus first-touch /
stage-latency canaries around the sweep.  Compare:

    python tools/firstkey_probe.py dedup_ngram_jaccard dedup_clusters
    python tools/firstkey_probe.py dedup_clusters dedup_ngram_jaccard
    SPARK_GRAFT_WARMUP=heavy python tools/firstkey_probe.py dedup_ngram_jaccard ...
    SPARK_GRAFT_THP=1 python tools/firstkey_probe.py ...   (adds
        -XX:+UseTransparentHugePages to the driver JVM)

to separate key-independent session costs (JIT, page re-fault) from
key-specific plan costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    keys = sys.argv[1:]
    if not keys:
        sys.exit("usage: firstkey_probe.py key [key ...]")

    extra_conf = None
    if os.environ.get("SPARK_GRAFT_THP"):
        extra_conf = {
            "spark.driver.extraJavaOptions": (
                "-XX:+AlwaysPreTouch -XX:+UnlockDiagnosticVMOptions"
                " -XX:GCLockerRetryAllocationCount=64"
                " -XX:+UseTransparentHugePages"
            )
        }

    from parquet_merger_spark.queries import QUERIES
    from parquet_merger_spark.session import (
        first_touch_canary_s,
        get_spark,
        stage_latency_canary_s,
        warm_engine,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t_sess = time.perf_counter()
    spark = get_spark("pm-firstkey", cpus=cpus, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    sess_s = round(time.perf_counter() - t_sess, 3)

    # bench.py's standard warm-up
    warm = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    warm.count()
    spark.range(0, cpus, 1, cpus).mapInPandas(lambda it: it, "id long").count()

    warm_s = 0.0
    if os.environ.get("SPARK_GRAFT_WARMUP") == "heavy":
        warm_s = warm_engine(spark, cpus)

    out: dict = {
        "session_s": sess_s,
        "heavy_warmup_s": warm_s,
        "canary_before": first_touch_canary_s(),
        "stage_before": stage_latency_canary_s(spark),
        # ordered (key, seconds) pairs: repeated keys stay distinct so the
        # run1-vs-warm-floor gap is visible (a dict silently overwrote them)
        "keys": [],
    }
    for name in keys:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        out["keys"].append([name, round(time.perf_counter() - t0, 3)])
    out["canary_after"] = first_touch_canary_s()
    out["stage_after"] = stage_latency_canary_s(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
