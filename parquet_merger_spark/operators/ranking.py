"""Skew-safe top-k per group.

The plain idiom — ``row_number() OVER (PARTITION BY g ORDER BY v)`` then
``rank <= k`` — creates ONE window partition per group: with few or
skewed groups (5 event types, one viral user), a handful of tasks sort
almost all the data.  Catalyst's WindowGroupLimit pushdown caps the rows
each partition keeps, but not the partition count.

:func:`topk_per_group_salted` restores parallelism with the standard
two-phase trick: phase 1 computes a LOCAL top-k inside (group, salt)
sub-partitions — ``salt = hash(id) % n_salts`` spreads each group over
n_salts tasks; phase 2 re-ranks only the n_salts*k survivors per group.
Identical output to the plain window (both phases keep every row that
could be in the global top-k), verified by an equality test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_row_ids(
    df: DataFrame,
    key_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 256,
    row_id_col: str = "row_id",
) -> DataFrame:
    """Global 1-based row ids in ``(key_col, *tiebreak_cols)`` ascending
    order — identical to ``row_number() OVER (ORDER BY key, tiebreaks)``
    — WITHOUT the global window, whose no-partitionBy sort funnels the
    entire dataset through one task (the exact pathology VERDICT flagged
    in the old IVF centroid build).

    Two-phase plan, every stage distributed:

    1. Split the key range into ``n_buckets`` contiguous buckets at
       sampled quantile boundaries (``approxQuantile`` — one cheap
       aggregate job; boundaries become literals, so bucket assignment
       is row-local).  Equal keys always share a bucket (strict ``<``
       against boundaries), so cross-bucket order is total.
    2. Rank within each bucket (window PARTITIONED by bucket — parallel),
       then add per-bucket offsets: bucket counts are ≤ n_buckets rows,
       collected to the driver and folded into a literal map — same
       model-not-data move as the IVF centroid literals.

    The result is EXACT for any bucketing (offsets + within-bucket rank
    reconstruct the total order); ``n_buckets`` only controls balance.
    Size it ~(rows / 10M) at scale so each bucket sort fits an executor.
    Null keys sort first (Spark ASC default; mirror with NULLS FIRST in
    SQL oracles).  ``key_col`` must be numeric (quantile sampling);
    tiebreaks are arbitrary orderable columns and must complete a total
    order for the ids to be deterministic.

    Costs two passes over ``df`` (quantile sample + count, then rank) —
    persist upstream if the input is expensive to recompute."""
    err = max(1e-4, 0.25 / n_buckets)
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(key_col, probs, err))) if probs else []

    key = F.col(key_col)
    if bounds:
        blit = F.array(*[F.lit(b) for b in bounds])
        bucket = F.size(F.filter(blit, lambda b: b < key))
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__bucket", bucket)

    counts = sorted(
        (r["__bucket"], r["n"])
        for r in bucketed.groupBy("__bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, running = {}, 0
    for b, n in counts:
        offsets[b] = running
        running += n
    pairs = [x for b, off in offsets.items() for x in (F.lit(b), F.lit(off))]
    offset_for = (
        F.element_at(F.create_map(*pairs), F.col("__bucket")) if pairs else F.lit(0)
    )

    w = Window.partitionBy("__bucket").orderBy(key, *[F.col(c) for c in tiebreak_cols])
    return (
        bucketed.withColumn("__lr", F.row_number().over(w))
        .withColumn(row_id_col, (offset_for + F.col("__lr")).cast("long"))
        .drop("__bucket", "__lr")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_from: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: when a handful of hot keys concentrate the
    left side into a few shuffle partitions, salt the left rows into
    ``n_salts`` sub-keys (deterministically, from ``salt_from`` — e.g.
    ``F.xxhash64("row_id")``) and replicate the RIGHT side once per salt,
    so each hot key spreads over n_salts tasks.  Identical output to the
    plain join (every left row still meets every matching right row,
    exactly once).

    Use when the skew is known up front and AQE's runtime skew-join split
    isn't available (e.g. a statically-planned pipeline); cost = right
    side x n_salts, so keep the right side the smaller one.

    Only left-preserving join types are allowed: in a right/full outer
    join an unmatched right key would survive once PER SALT COPY
    (n_salts duplicate null-padded rows), so those are rejected."""
    assert how in ("inner", "left", "left_outer", "leftouter", "semi",
                   "left_semi", "leftsemi", "anti", "left_anti", "leftanti"), (
        f"how={how!r} would duplicate unmatched right rows across salt copies"
    )
    l_salted = left.withColumn("__salt", F.pmod(salt_from, F.lit(n_salts)))
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_salted, [*on, "__salt"], how).drop("__salt")


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Plain windowed top-k (fine when groups are many and balanced)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def topk_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    salt_col: Column,
    n_salts: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Two-phase top-k: local top-k per (group, salt), then global re-rank
    of the survivors.  ``salt_col`` must be a deterministic function of the
    row (e.g. ``F.xxhash64("id")``) so results are stable.  Output is
    row-for-row identical to :func:`topk_per_group` PROVIDED ``order_by``
    is a TOTAL order within each group (end with a unique tiebreak column)
    — under ties, row_number picks arbitrarily per slice and the two
    phases could keep a different (equally-ranked) row set."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(n_salts)))
    w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_by)
    survivors = (
        salted.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__salt")
    )
    return topk_per_group(survivors, group_cols, order_by, k, rank_col)
