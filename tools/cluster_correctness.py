#!/usr/bin/env python3
"""Multi-JVM correctness sweep on a ``local-cluster`` master (r09 ask #1).

Every prior artifact ran ``local[32]`` — ONE JVM, so executor-side
serialization, block transfer between processes, broadcast distribution,
and the ~20 ``localCheckpoint`` sites (blocks stored on executors,
non-replicated) had zero cross-process evidence.  Spark's
``local-cluster[n,cores,mem_mb]`` master launches REAL executor JVMs
(separate processes with their own heaps, python workers, and block
managers) inside this sandbox — the closest available approximation of a
real cluster's execution boundaries.

This tool re-runs the contract's ``queries()`` keys against their DuckDB
oracles at sf0.01 — the identical compare the driver and
``tools/correctness_local.py`` use — but on a
``local-cluster[2,8,8192]`` session, and writes the driver-format rows
to ``CLUSTER_CORRECTNESS_r{N}.json``.

Usage (repo root):

    python tools/cluster_correctness.py            # all keys
    python tools/cluster_correctness.py key1 key2  # subset
    SPARK_GRAFT_CLUSTER="local-cluster[3,4,6144]" python tools/cluster_correctness.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from parquet_merger_spark.oracle import canon_hash as _canon_hash  # noqa: E402
from parquet_merger_spark.oracle import register_views  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
MASTER = os.environ.get("SPARK_GRAFT_CLUSTER", "local-cluster[2,8,8192]")


def get_cluster_spark():
    """A session on real multi-JVM executors with the engine's standard
    SQL confs (mirrors ``session.get_spark`` where the conf is not
    local-mode-specific).  ``SPARK_HOME``/``PYSPARK_PYTHON`` must point
    at the pip-installed pyspark and the current interpreter so worker
    JVMs and their python daemons launch from the same install."""
    import pyspark
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    # total executor cores across the cluster drives the shuffle default
    import re

    m = re.match(r"local-cluster\[(\d+),(\d+),(\d+)\]", MASTER)
    n_exec, cores, _mem = (int(g) for g in m.groups()) if m else (2, 8, 8192)
    return (
        SparkSession.builder.master(MASTER)
        .appName("pm-cluster-correctness")
        # the master string's third number sizes the WORKER's allotment,
        # NOT the executor JVM: without this conf the executor heap is
        # Spark's 1g default (verified empirically r10 — every executor
        # reported ~434MB unified memory under local-cluster[2,16,16384]).
        # Request the full worker allotment so the label means what it
        # says.  Historical note: the r09 cluster sweeps therefore ran
        # 1 GiB executor heaps — correctness held regardless.
        .config("spark.executor.memory", f"{_mem}m")
        .config("spark.sql.shuffle.partitions", str(n_exec * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "6g")
        # executor-side spill-reader fix from MEM_SCALING_r08 applies to
        # every JVM that aggregates, not just a local-mode driver
        .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
        )
        .getOrCreate()
    )


def main() -> None:
    import duckdb

    from parquet_merger_spark.queries import ORACLE_SQL, QUERIES
    from parquet_merger_spark.session import pin_oracle_confs

    from parquet_merger_spark.session import ship_package

    only = set(sys.argv[1:])
    spark = pin_oracle_confs(get_cluster_spark())
    spark.sparkContext.setLogLevel("ERROR")
    # executors must be able to import the package: module-level
    # applyInPandas/mapInPandas kernels pickle by reference (see
    # session.ship_package — 7 keys failed without this)
    ship_package(spark)
    # optional: exercise the RELIABLE checkpoint path (barrier.materialize
    # switches every iterative operator's lineage cut from localCheckpoint
    # to FS checkpoint when a dir is set — the executor-loss-safe mode)
    ckpt = os.environ.get("SPARK_GRAFT_RELIABLE_CKPT")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
        print(f"# reliable checkpoints -> {ckpt}")
    # the artifact must PROVE multi-JVM execution: wait until every
    # executor JVM has registered its block manager (the count includes
    # the driver's), and hard-fail rather than record a sweep that
    # silently ran driver-only or under-provisioned
    import re as _re

    want = int((_re.match(r"local-cluster\[(\d+),", MASTER) or [None, "2"])[1])
    deadline = time.time() + 120
    while True:
        n_execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
        if n_execs >= want + 1:
            break
        if time.time() > deadline:
            raise RuntimeError(
                f"only {n_execs} block managers (incl driver) registered "
                f"after 120s; wanted {want} executor JVMs — not multi-JVM"
            )
        time.sleep(2)
    print(f"# master={MASTER}  block managers (incl driver)={n_execs}")
    con = duckdb.connect()
    register_views(con, SF_DIR)

    out: dict[str, dict] = {}
    keys = [k for k in sorted(QUERIES) if not only or k in only]
    t_start = time.time()
    for name in keys:
        row: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            spark.catalog.clearCache()
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            row["spark_rows"] = int(len(sdf))
            if name in ORACLE_SQL:
                ddf = con.execute(ORACLE_SQL[name]).df()
                row["oracle_rows"] = int(len(ddf))
                row["rows_match"] = len(sdf) == len(ddf)
                row["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                row["hash_match"] = (
                    row["rows_match"]
                    and row["schema_match"]
                    and _canon_hash(sdf) == _canon_hash(ddf)
                )
            else:
                row["err"] = "no_oracle"
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            row["err"] = f"{type(ex).__name__}: {ex}"[:300]
        row["sec"] = round(time.time() - t0, 3)
        out[name] = row
        status = (
            "PASS" if row["hash_match"]
            else ("rows-only" if row["err"] == "no_oracle" else "FAIL")
        )
        print(f"{name}: {status} ({row['spark_rows']} rows, {row['sec']}s)",
              flush=True)

    from parquet_merger_spark.oracle import next_round

    n = next_round(ROOT)
    result = {
        "master": MASTER,
        "sf_dir": SF_DIR,
        "block_managers_incl_driver": n_execs,
        "wall_s": round(time.time() - t_start, 1),
        "keys": out,
    }
    path = os.environ.get("SPARK_GRAFT_CLUSTER_OUT") or os.path.join(
        ROOT, f"CLUSTER_CORRECTNESS_r{n:02d}.json"
    )
    from artifact import write_artifact

    moved = write_artifact(path, result, indent=1)
    if moved:
        print(f"# previous artifact preserved at {moved}")
    n_pass = sum(1 for r in out.values() if r["hash_match"])
    n_ro = sum(1 for r in out.values() if r["err"] == "no_oracle")
    n_fail = len(out) - n_pass - n_ro
    print(f"\n{path}: {n_pass} pass, {n_ro} rows-only, {n_fail} fail")
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
