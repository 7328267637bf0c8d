"""Bucketed (pre-partitioned) tables: the shuffle-elimination lever for
repeated big-to-big joins.

A join between two fact tables shuffles BOTH sides on the key every time
it runs.  Writing each table bucketed by the join key (hash-partitioned
into a fixed bucket count, sorted within buckets) moves that shuffle to
WRITE time, once: every subsequent join on the key is planned as a
zip-partition sort-merge join with NO Exchange on either side — at 100 TB
that's the difference between re-shuffling terabytes per query and
streaming co-located buckets.

Spark's bucketing lives in the catalog (``saveAsTable``); plain
``.parquet(path)`` writes lose the metadata.  Bucket counts must match
(or divide, with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``)
for the shuffle to be elided.  The no-Exchange plan property is asserted
in tests/test_plans.py, not just claimed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets makes the downstream sort-merge join skip its
    sort as well (plan shows neither Exchange nor Sort)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planned
    shuffle-free when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def zorder_value(col_x, col_y, bits: int = 8):
    """Interleave the low ``bits`` of two non-negative bucket ids into a
    Morton (Z-curve) value — x on even bit positions, y on odd.  All
    literal-count shifts (JVM-side, codegen-friendly).  Sorting or
    partitioning by this single value gives LOCALITY IN BOTH dimensions:
    a range predicate on either axis touches only the z-cells its
    rectangle intersects — the multi-dimension data-skipping layout
    (Delta/Iceberg ``OPTIMIZE ZORDER BY``) that one-column range
    partitioning cannot express.  At 100 TB: cluster the table by
    z(bucket(a), bucket(b)) once, and BOTH ``a BETWEEN``- and
    ``b BETWEEN``-shaped scans prune to the rectangle's cells."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(
            F.shiftright(col_x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        z = z + F.shiftleft(
            F.shiftright(col_y.cast("long"), i).bitwiseAND(F.lit(1)),
            2 * i + 1,
        )
    return z


def zorder_covering_buckets(
    bx_range: tuple[int, int],
    by_range: tuple[int, int],
    bits: int = 8,
    prefix_bits: int = 4,
) -> list[int]:
    """The z-partition ids (top ``prefix_bits`` of the 2*bits z-value)
    whose quad-tree cell intersects the bucket-range rectangle — the
    driver-side covering set for a 2-D range predicate (model-sized:
    at most 2^prefix_bits ids, enumerated in Python).  Guaranteed a
    SUPERSET of every partition holding a matching row, so
    ``isin(covering) AND row-predicate`` equals the plain predicate.

    ``prefix_bits`` must be EVEN (the z-prefix interleaves one bit per
    axis): silently flooring an odd value would emit ids in a narrower
    id space than the caller's shiftright derives, excluding partitions
    that hold matching rows — a correctness, not performance, failure.
    """
    if prefix_bits % 2 != 0 or prefix_bits <= 0 or prefix_bits > 2 * bits:
        raise ValueError(
            f"prefix_bits must be even and in (0, {2 * bits}]; got {prefix_bits}"
        )
    half = prefix_bits // 2
    cell = 1 << (bits - half)  # bucket-width of one cell per axis
    out = []
    for tx in range(1 << half):
        if tx * cell > bx_range[1] or (tx + 1) * cell - 1 < bx_range[0]:
            continue
        for ty in range(1 << half):
            if ty * cell > by_range[1] or (ty + 1) * cell - 1 < by_range[0]:
                continue
            z = 0
            for i in range(half):
                z |= ((tx >> i) & 1) << (2 * i)
                z |= ((ty >> i) & 1) << (2 * i + 1)
            out.append(z)
    return sorted(out)
