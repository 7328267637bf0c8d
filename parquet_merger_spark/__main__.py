"""CLI for the engine — the reference's GUI workflow as commands.

The reference (shanytc/parquet-merger) exposes its pipeline through GUI
clicks: Add Folder -> Scan -> Smart Batch -> Merge (src/main.rs README
workflow).  A user switching to this repo needs that workflow headless:

    python -m parquet_merger_spark scan   FOLDER [FOLDER...]
    python -m parquet_merger_spark plan   FOLDER [FOLDER...]
    python -m parquet_merger_spark merge  FOLDER [FOLDER...] --out DIR
        [--csv] [--no-single-file] [--compression zstd]
        [--concurrency N] [--cpus N]

`scan` lists the file catalog, `plan` prints the smart batches (dry
run), `merge` executes them.  Exit code 1 if any batch failed (per-batch
isolation: remaining batches still run, matching the reference's
aggregated-errors behavior).
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="parquet_merger_spark",
        description="PySpark-native parquet merge engine",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("folders", nargs="+", help="folders to scan recursively")
        sp.add_argument("--cpus", type=int, default=4, help="local cores")

    sp_scan = sub.add_parser("scan", help="list discovered parquet files")
    common(sp_scan)

    sp_plan = sub.add_parser("plan", help="print smart batches (dry run)")
    common(sp_plan)

    sp_merge = sub.add_parser("merge", help="execute smart batches")
    common(sp_merge)
    sp_merge.add_argument("--out", required=True, help="output directory")
    sp_merge.add_argument("--csv", action="store_true", help="also export CSV")
    sp_merge.add_argument(
        "--no-single-file",
        action="store_true",
        help="keep Spark's parallel directory output (scale mode) instead "
        "of one file per batch (reference-parity mode)",
    )
    sp_merge.add_argument("--compression", default="snappy")
    sp_merge.add_argument("--concurrency", type=int, default=1)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from parquet_merger_spark.sources.catalog import scan_folders

    entries = scan_folders(args.folders)
    if args.cmd == "scan":
        for e in entries:
            print(e.display_path)
        print(f"{len(entries)} file(s)", file=sys.stderr)
        return 0

    from parquet_merger_spark.session import get_spark

    spark = get_spark("pm-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_merger_spark.plans.planner import smart_batch

    plans, singletons = smart_batch(spark, entries)
    if args.cmd == "plan":
        for pl in plans:
            flag = " [schema-mismatch -> intersect]" if pl.schema_mismatch else ""
            print(f"{pl.name}: {len(pl.paths)} files{flag}")
            for path in pl.paths:
                print(f"  {path}")
        print(f"{len(plans)} batch(es), {singletons} singleton(s)", file=sys.stderr)
        return 0

    from parquet_merger_spark.operators.merge import merge_batches

    results = merge_batches(
        spark,
        plans,
        args.out,
        single_file=not args.no_single_file,
        csv=args.csv,
        max_concurrency=args.concurrency,
        compression=args.compression,
    )
    failed = 0
    for r in results:
        if r.ok:
            print(f"OK   {r.name}: {r.rows} rows -> {r.output_path}")
        else:
            failed += 1
            print(f"FAIL {r.name}: {r.error}")
    print(
        f"{len(results) - failed}/{len(results)} batch(es) merged", file=sys.stderr
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
