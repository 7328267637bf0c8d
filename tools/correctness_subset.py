#!/usr/bin/env python3
"""Check a subset of contract keys against their DuckDB oracles.

Same compare as tools/correctness_local.py, but only for the key names
given on the command line — the fast feedback loop while adding a
widening wave, before the full end-of-round sweep.

Usage:  python tools/correctness_subset.py key1 key2 ...
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from parquet_merger_spark.oracle import canon_hash, register_views  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    import duckdb

    from parquet_merger_spark.queries import ORACLE_SQL, QUERIES
    from parquet_merger_spark.session import get_spark

    keys = sys.argv[1:]
    unknown = [k for k in keys if k not in QUERIES]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")

    spark = get_spark("pm-correctness-subset", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    register_views(con, SF_DIR)

    failed = []
    for name in keys:
        try:
            spark.catalog.clearCache()
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            if name not in ORACLE_SQL:
                print(f"{name}: rows-only ({len(sdf)} rows)", flush=True)
                continue
            ddf = con.execute(ORACLE_SQL[name]).df()
            ok_rows = len(sdf) == len(ddf)
            ok_schema = sorted(sdf.columns) == sorted(ddf.columns)
            ok_hash = ok_rows and ok_schema and canon_hash(sdf) == canon_hash(ddf)
            status = "PASS" if ok_hash else "FAIL"
            detail = ""
            if not ok_rows:
                detail = f" rows {len(sdf)} vs {len(ddf)}"
            elif not ok_schema:
                detail = f" schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
            elif not ok_hash:
                detail = " value-hash mismatch"
            print(f"{name}: {status} ({len(sdf)} rows){detail}", flush=True)
            if not ok_hash:
                failed.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERR {type(ex).__name__}: {ex}", flush=True)
            failed.append(name)
    if failed:
        sys.exit(f"FAILED: {failed}")
    print("all green")


if __name__ == "__main__":
    main()
