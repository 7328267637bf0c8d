#!/usr/bin/env python3
"""Committed streaming-latency artifact (STREAM_LATENCY_r{N}.json).

The 9 stream_* keys are correctness-proven (batch-twin oracles + replay
idempotence) but are excluded from the bench headline by design — their
wall clock is dominated by the replay harness (fixture writes, restarts),
not operator cost.  What IS the operator cost is each micro-batch's
processing latency, which Spark reports per batch in the streaming
progress events.  This tool runs every stream_* key at sf0.01, collects
the per-micro-batch progress captured by ``queries._drain_stream``, and
writes a compact round-over-round diffable JSON:

    {key: {"wall_s": total harness wall,
           "batches": [{"batch_id", "input_rows",
                        "addBatch_ms", "trigger_ms"}, ...],
           "addBatch_ms_total": sum of per-batch processing latency}}

Run from the repo root:  python tools/streaming_latency.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    from parquet_merger_spark import queries as Q
    from parquet_merger_spark.session import get_spark

    spark = get_spark("pm-stream-latency", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")

    stream_keys = sorted(k for k in Q.QUERIES if k.startswith("stream_"))
    out: dict[str, dict] = {}
    for key in stream_keys:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # the full action: run the harness AND materialize the result
        # table it returns (the read-back is part of the key's contract)
        n_rows = Q.QUERIES[key](spark, SF_DIR).count()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        add_total = 0.0
        for p in Q.STREAM_PROGRESS.get(key, []):
            dur = p.get("duration_ms") or {}
            add_ms = dur.get("addBatch")
            batches.append(
                {
                    "batch_id": p.get("batch_id"),
                    "input_rows": p.get("input_rows"),
                    "addBatch_ms": add_ms,
                    "trigger_ms": dur.get("triggerExecution"),
                }
            )
            if add_ms is not None:
                add_total += add_ms
        out[key] = {
            "wall_s": wall,
            "result_rows": n_rows,
            "batches": batches,
            "addBatch_ms_total": round(add_total, 1),
        }
        print(
            f"{key}: wall {wall}s, {len(batches)} micro-batches, "
            f"addBatch total {add_total:.0f}ms",
            flush=True,
        )

    from parquet_merger_spark.oracle import next_round

    n = next_round(ROOT)
    path = os.path.join(ROOT, f"STREAM_LATENCY_r{n:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
