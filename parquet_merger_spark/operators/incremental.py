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

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    change_col: str = "change",
) -> DataFrame:
    """Change-data-capture between two table snapshots: one row per key
    that changed, labeled ``insert`` (key only in ``new``), ``delete``
    (key only in ``old``), or ``update`` (key in both, any non-key column
    differs).  Unchanged keys produce no output — the diff is the
    incremental payload a downstream consumer replays.

    One full outer join on the key (single shuffle, AQE-skew-safe); the
    update test is a null-safe struct comparison (``eqNullSafe``) so
    NULL→value and value→NULL transitions count as changes.  Output
    carries the NEW side's columns for inserts/updates and the OLD side's
    for deletes.  Both snapshots must share the schema.

    NULL keys: rows whose key columns are NULL never equi-join (SQL
    semantics), so a null-key row in ``old`` reports as ``delete`` and
    one in ``new`` as ``insert`` — even when both snapshots contain it.
    Keys should be non-null by contract; the labels are at least
    side-correct (membership comes from explicit presence markers, not
    key nullness)."""
    # ValueError, not assert: stripped under python -O, mismatched
    # snapshots would positional-compare the wrong columns silently
    if old.columns != new.columns:
        raise ValueError("snapshots must share a schema")
    val_cols = [c for c in old.columns if c not in key_cols]
    # column-rename disambiguation: the two snapshots often share lineage
    # (same source table), so frame-qualified references are ambiguous.
    # Each side also carries an explicit presence marker: deriving side
    # membership from key-column nullness would misclassify a row whose
    # KEY is genuinely NULL (an old-side null-key row would read as
    # "absent from old" -> labeled insert instead of delete).
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__in_new"),
    )
    join_cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__o_{c}") == F.col(f"__n_{c}") for c in key_cols],
    )
    joined = o.join(n, join_cond, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same_vals = (
        reduce(
            lambda a, b: a & b,
            [F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in val_cols],
        )
        if val_cols
        else F.lit(True)
    )
    label = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~same_vals, F.lit("update"))
    )
    out_cols = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c) for c in key_cols
    ] + [
        F.when(in_new, F.col(f"__n_{c}")).otherwise(F.col(f"__o_{c}")).alias(c)
        for c in val_cols
    ]
    return (
        joined.withColumn(change_col, label)
        .filter(F.col(change_col).isNotNull())
        .select(*out_cols, change_col)
    )


def upsert_by_key(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    bloom_prefilter_bits: int | None = None,
) -> DataFrame:
    """Last-write-wins upsert: every row of ``updates``, plus the rows of
    ``base`` whose key does not appear in ``updates``.

    Requires both frames to share a schema (same contract as the merge
    engine's union).  Deterministic: output depends only on the two
    inputs, not on partitioning or arrival order.

    ``bloom_prefilter_bits`` (single-key upserts) turns on the runtime
    Bloom key-set reduction: the update keys are packed into a
    broadcast m-bit Bloom and tested against the base ROW-LOCALLY —
    bloom-NEGATIVE rows cannot match any update key (no false
    negatives), so they bypass the anti-join entirely and only the
    bloom-positive slice rides through its exchange.  At 100 TB this
    turns "shuffle the whole base to apply a 0.1% refresh" into
    "shuffle ~the refresh-sized slice"; false positives only cost
    shuffle bytes and are removed by the anti-join itself.  Result is
    IDENTICAL to the plain upsert (pinned in tests); rows with a NULL
    key never equi-join and stay on the bypass branch."""
    missing = [c for c in base.columns if c not in updates.columns]
    if missing:
        raise ValueError(
            f"upsert requires matching schemas; updates lacks {missing}"
        )
    update_keys = updates.select(*key_cols).distinct()
    if bloom_prefilter_bits and len(key_cols) == 1:
        from pyspark.sql import functions as F

        from parquet_merger_spark.operators.sketches import (
            bloom_build,
            bloom_test_col,
        )

        key = key_cols[0]
        # internal column uniquely prefixed like every other helper in
        # this module: a base table with its own 'words' column would
        # otherwise hit an ambiguous reference (or lose its column)
        bloom = bloom_build(
            update_keys, key, m_bits=bloom_prefilter_bits
        ).withColumnRenamed("words", "__bloom_words")
        tagged = base.crossJoin(F.broadcast(bloom))
        may_match = F.coalesce(
            bloom_test_col("__bloom_words", key, m_bits=bloom_prefilter_bits),
            F.lit(False),
        )
        sure_keep = tagged.filter(~may_match).drop("__bloom_words")
        maybe = tagged.filter(may_match).drop("__bloom_words")
        kept = maybe.join(update_keys, key_cols, "left_anti").unionByName(
            sure_keep
        )
    else:
        kept = base.join(update_keys, key_cols, "left_anti")
    return kept.unionByName(updates.select(*base.columns))


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    snap_col: str = "snap_id",
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: collapse a sequence of full
    snapshots (tagged with an ordered ``snap_col``) into versioned rows
    ``key + tracked + valid_from + valid_to`` — ``valid_from`` = the
    snapshot where that tracked-value combination first appeared,
    ``valid_to`` = the snapshot that replaced it (null = current).

    A key absent from later snapshots simply keeps its last open
    version (deletion-tracking would add a tombstone pass; out of scope
    to match the warehouse-standard SCD2 contract).

    Execution shape: one shuffle on the key (both windows share the
    exact (key, snap) sort — Catalyst plans a single Exchange+Sort),
    change detection via null-safe lag comparison, interval close via
    lead.  Per-key state is bounded by that key's snapshot count, never
    by table size, so skew is capped at n_snapshots rows per key.
    """
    w = Window.partitionBy(*key_cols).orderBy(snap_col)
    # empty tracked_cols = key-presence-only history: no value change is
    # possible, only the first appearance opens a version (reduce() over
    # an empty iterable would raise TypeError, the guard snapshot_diff
    # already has for its val_cols)
    value_changed = (
        reduce(
            lambda a, b: a | b,
            [~F.col(c).eqNullSafe(F.lag(c).over(w)) for c in tracked_cols],
        )
        if tracked_cols
        else F.lit(False)
    )
    changed = value_changed | F.lag(snap_col).over(w).isNull()
    versions = (
        snapshots.withColumn("_chg", changed)
        .filter("_chg")
        .withColumn("valid_from", F.col(snap_col))
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy(*key_cols).orderBy("valid_from")
            ),
        )
    )
    return versions.select(*key_cols, *tracked_cols, "valid_from", "valid_to")


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    change_col: str = "change",
) -> DataFrame:
    """Apply a :func:`snapshot_diff` changelog to a snapshot — the CDC
    CONSUMER side, closing the loop: ``apply_changes(old,
    snapshot_diff(old, new, k), k) == new`` (the round-trip law the
    differential oracle certifies).  Every changed key's old row is
    dropped (one anti-join on the key — inserts anti-join nothing), then
    the insert/update rows (which carry NEW values) union in.

    Scale: one shuffle each for the anti-join and nothing else; the
    changelog is typically tiny next to the snapshot, so AQE broadcasts
    it into the anti-join.

    NULL keys: the anti-join is NULL-SAFE (``eqNullSafe`` per key
    column), so the law holds even for the null-key rows
    :func:`snapshot_diff` labels delete+insert — a plain equi-anti-join
    would KEEP the old null-key row while the insert row unions in,
    duplicating it.
    """
    changed_keys = changes.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols]
    ).distinct()
    cond = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__k_{c}")) for c in key_cols],
    )
    kept = old.join(changed_keys, cond, "left_anti")
    applied = changes.filter(F.col(change_col) != "delete").drop(change_col)
    return kept.unionByName(applied)


def refresh_groups(
    old_agg: DataFrame,
    changed_groups: DataFrame,
    recomputed: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """INCREMENTAL AGGREGATE REFRESH stitch: keep ``old_agg`` rows whose
    group is untouched, replace the rest with ``recomputed`` (the
    aggregate rebuilt ONLY over the changed groups' base rows).  The
    incremental-ETL contract — refresh cost scales with the CHANGED
    partition count, not the table — reduced to one anti-join; the
    caller proves equivalence to a full recompute via the differential
    oracle.

    ``changed_groups``: distinct group keys touched by the update batch
    (typically derived from the changelog); tiny, so AQE broadcasts it.
    ``recomputed`` must carry ``old_agg``'s schema.
    """
    kept = old_agg.join(changed_groups, group_cols, "left_anti")
    return kept.unionByName(recomputed)
