"""Incremental ingestion: keyed upsert of a new batch into a base table.

EXTENSION surface (the reference merges whole files append-only,
src/main.rs:300-450; it has no keyed update path).  This is the
refresh primitive every periodically-rebuilt training corpus needs:
re-crawled documents replace their previous versions, new documents
append — without rewriting rows whose key did not arrive in the batch.

Scale design (100 TB):
- ONE shuffle, on the key: the base side anti-joins the update keys
  (AQE broadcasts the key set when the batch is small — the common case,
  where the nightly delta is a fraction of the corpus — making the pass
  over base shuffle-free), then the updates union on by name.
- No driver-side state, no collect; both branches stream.
- At petabyte scale this is the logical core of what table formats
  (Delta/Iceberg MERGE) execute with file-level pruning on top: express
  the same plan here, let partition pruning on the key's partition
  column bound the rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert_by_key(
    base: DataFrame, updates: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Last-write-wins upsert: every row of ``updates``, plus the rows of
    ``base`` whose key does not appear in ``updates``.

    Requires both frames to share a schema (same contract as the merge
    engine's union).  Deterministic: output depends only on the two
    inputs, not on partitioning or arrival order.
    """
    missing = [c for c in base.columns if c not in updates.columns]
    if missing:
        raise ValueError(
            f"upsert requires matching schemas; updates lacks {missing}"
        )
    kept = base.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
    return kept.unionByName(updates.select(*base.columns))
