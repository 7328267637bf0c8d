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
