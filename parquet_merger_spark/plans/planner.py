"""Batch planning: manual batches and "smart batch" grouping (SURVEY EP2).

A ``MergePlan`` is the logical plan the reference builds per batch:
``Sink(Union(Project?(Scan(f) for f in files)))`` with the projection
decision (full schema vs common-column intersection) resolved at execution
time (reference: `Batch` struct src/main.rs:45-54, `add_batch` :184-228,
`smart_batch` :237-296).

Smart batching groups the discovered file list by bare filename and keeps
groups with more than one member (groupBy + HAVING count > 1).  The group
metadata is tiny relative to the data, so planning runs on the driver; the
same grouping is also expressible over the file-catalog DataFrame
(``file_catalog_df(...).groupBy("file_name")``) when the catalog itself is
large.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from parquet_merger_spark.functions.naming import generate_batch_name
from parquet_merger_spark.plans.schema import check_schema_mismatch
from parquet_merger_spark.sources.catalog import ParquetFileEntry, probe_schemas


@dataclass
class MergePlan:
    """One unit of merging: a named set of input files."""

    name: str
    paths: list[str] = field(default_factory=list)
    schema_mismatch: bool = False


def _stem(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


@dataclass
class SelectionSet:
    """O3: the reference's file-selection state (HashSet<usize> of indices,
    src/main.rs:75) with its select-all / deselect-all-over-the-FILTERED-
    subset semantics (:1046-1058, :1089-1098).  Driver-side UI state, kept
    for API parity; selections feed :func:`plan_batch`.
    """

    selected: set[int] = field(default_factory=set)

    def toggle(self, idx: int) -> None:
        self.selected.symmetric_difference_update({idx})

    def select_all(self, visible: list[int]) -> None:
        """Select every index in the currently-visible (filtered) subset —
        previously-selected hidden indices stay selected (reference
        behavior: only the shown list is mutated)."""
        self.selected.update(visible)

    def deselect_all(self, visible: list[int]) -> None:
        self.selected.difference_update(visible)

    def clear(self) -> None:
        self.selected.clear()

    def resolve(self, entries: list) -> list:
        return [entries[i] for i in sorted(self.selected)]


def remove_completed(plans: list[MergePlan], results: list) -> list[MergePlan]:
    """R3: drop successfully-merged batches from the plan list (reference
    removes by index in reverse order to keep indices stable,
    src/main.rs:380-385 — equivalent here to filtering on the paired
    result's success flag).  Failed batches stay for retry.

    ``results`` must align 1:1 with ``plans`` (the contract
    ``merge_batches`` provides); a length mismatch raises rather than
    silently dropping unpaired plans from the retry list."""
    if len(plans) != len(results):
        raise ValueError(
            f"plans ({len(plans)}) and results ({len(results)}) must pair 1:1"
        )
    return [p for p, r in zip(plans, results) if not r.ok]


def plan_batch(
    spark: SparkSession, paths: list[str], batch_number: int = 0
) -> MergePlan:
    """Manual batch from an explicit file selection (reference: add_batch,
    src/main.rs:184-228): deterministic order, advisory mismatch flag from
    footer-only probes, name derived from member file stems."""
    paths = sorted(paths)
    schemas = probe_schemas(spark, paths)
    mismatch = check_schema_mismatch(schemas)
    name = generate_batch_name([_stem(p) for p in paths], batch_number)
    return MergePlan(name=name, paths=paths, schema_mismatch=mismatch)


def smart_batch(
    spark: SparkSession, entries: list[ParquetFileEntry]
) -> tuple[list[MergePlan], int]:
    """Group files by bare filename; every group with >1 member becomes a
    batch named by the filename stem; returns (plans, singleton_count)
    (reference: smart_batch, src/main.rs:237-296 — groupBy at :246-255,
    HAVING count>1 at :262, stem naming at :271-275)."""
    groups: dict[str, list[str]] = {}
    for e in entries:
        groups.setdefault(os.path.basename(e.full_path), []).append(e.full_path)

    batched = {
        filename: sorted(paths)
        for filename, paths in groups.items()
        if len(paths) > 1
    }
    singletons = sum(1 for paths in groups.values() if len(paths) <= 1)
    # ONE concurrent probe over every batch member (not per-group serial
    # loops): at 100k files the footer probes, not the merges, dominate
    # planning wall — see probe_schemas
    flat = [p for paths in batched.values() for p in paths]
    probed = dict(zip(flat, probe_schemas(spark, flat)))
    plans = [
        MergePlan(
            name=os.path.splitext(filename)[0],
            paths=paths,
            schema_mismatch=check_schema_mismatch([probed[p] for p in paths]),
        )
        for filename, paths in batched.items()
    ]
    plans.sort(key=lambda p: p.name)
    return plans, singletons
