"""File discovery, schema probing, and the file-catalog DataFrame.

Covers SURVEY §2.1 S1-S4 (reference: /root/reference/src/main.rs —
`scan_folders` :138-182, `get_file_schema` :433-437, read loop :582-599).

Discovery runs on the driver (like the reference's WalkDir): it is pure
metadata over directory listings.  The *data* scan is a lazy Spark read that
executes on executors.  At 100 TB / object-store scale the idiomatic path is
`spark.read.option("recursiveFileLookup", ...)` which lists in parallel on
the cluster; `scan_folders` exists to expose the reference's file-catalog
surface (display paths, per-file rows) for planning and UIs.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class ParquetFileEntry:
    """One discovered parquet file (reference struct: src/main.rs:37-43)."""

    full_path: str
    display_path: str  # path relative to the registered folder


def _is_parquet(name: str) -> bool:
    """Case-insensitive extension check (reference: src/main.rs:151-152)."""
    return os.path.splitext(name)[1].lower() == ".parquet"


def scan_folders(folders: list[str]) -> list[ParquetFileEntry]:
    """Recursively discover parquet files under each folder, following
    symlinks, sorted by display path (reference: src/main.rs:138-182).

    Driver-side metadata walk; does not read any file contents.
    """
    entries: list[ParquetFileEntry] = []
    # dedup PHYSICAL files across registrations, not just folder strings:
    # registering a folder and its subfolder (or a symlinked alias) must
    # not catalog the same file twice — smart_batch groups by basename,
    # so a double-cataloged file would merge with itself and duplicate
    # every row in the output
    seen_files: set[str] = set()
    for folder in dict.fromkeys(folders):  # registration dedups folders (O2)
        # followlinks=True matches the reference's WalkDir(follow_links);
        # WalkDir detects symlink cycles, os.walk does not — track visited
        # directories by (st_dev, st_ino) and prune re-entries so a cyclic
        # symlink can't hang discovery.
        seen_dirs: set[tuple[int, int]] = set()
        for dirpath, dirnames, filenames in os.walk(folder, followlinks=True):
            try:
                st = os.stat(dirpath)
            except OSError:
                dirnames[:] = []
                continue
            dev_ino = (st.st_dev, st.st_ino)
            if dev_ino in seen_dirs:
                dirnames[:] = []  # already walked: stop descending
                continue
            seen_dirs.add(dev_ino)
            for name in filenames:
                if not _is_parquet(name):
                    continue
                full = os.path.join(dirpath, name)
                real = os.path.realpath(full)
                if real in seen_files:
                    continue
                seen_files.add(real)
                display = os.path.relpath(full, folder)
                entries.append(ParquetFileEntry(full_path=full, display_path=display))
    entries.sort(key=lambda e: e.display_path)
    return entries


def probe_schema(spark: SparkSession, path: str) -> StructType | None:
    """Footer-only schema probe; None when unreadable
    (reference: src/main.rs:433-437 returns Option).

    ``spark.read.parquet(path).schema`` reads only parquet footers on the
    driver — no data pages, no executor job.
    """
    try:
        return spark.read.parquet(path).schema
    except Exception:
        return None


def file_catalog_df(spark: SparkSession, folders: list[str]) -> DataFrame:
    """The discovered-file list as a DataFrame: (full_path, display_path,
    file_name, file_stem).

    This is the metadata table the reference's GUI list/search/smart-batch
    operate on; keeping it a DataFrame lets those become ordinary Spark ops
    (filter/groupBy) and scale to millions of files.
    """
    from parquet_merger_spark.functions.strings import basename_col, stem_col

    entries = scan_folders(folders)
    schema = "full_path string, display_path string"
    df = spark.createDataFrame(
        [(e.full_path, e.display_path) for e in entries], schema=schema
    )
    return df.withColumns(
        {
            "file_name": basename_col("full_path"),
            "file_stem": stem_col("full_path"),
        }
    )


def read_parquet_batch(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Vectorized multi-file parquet scan (reference read loop:
    src/main.rs:582-599, one file at a time; Spark reads all files of a
    batch as one distributed scan with a task per split)."""
    return spark.read.parquet(*paths)
