"""Bucketized range join: the large-dimension scale path for interval
lookups.

``value BETWEEN lo AND hi`` joins have two physical shapes in Spark:

* dim side small → ``broadcast(dims)`` + BroadcastNestedLoopJoin: each
  probe row scans a tiny local array.  Right answer, already used by
  ``queries.q_value_band_stats``.
* dim side LARGE (too big to broadcast — think a million CIDR blocks or
  price tiers) → a nested-loop join is O(facts × dims) and Catalyst has
  no native interval-join operator.  The classic fix (used by every
  distributed engine's range-join hint, e.g. the public Databricks/
  Photon range-join optimization) is to discretize: explode each dim
  interval into the fixed-width buckets it covers, tag each fact with
  its single containing bucket, equi-join on the bucket id — which
  shuffles/broadcasts like any hash join and scales linearly — then
  re-apply the exact predicate to discard bucket-collision false
  positives.

Cost model: dims explode to ``ceil(width/bucket_width)+1`` rows each, so
``bucket_width`` should sit near the typical interval width (factor ~1-4
amplification).  Facts never amplify: one bucket per row.  Both join
inputs are plain equi-join children, so AQE can still pick broadcast vs
shuffle by size, handle skewed buckets, and coalesce partitions.

Intervals are half-open ``[lo, hi)`` — matching event-time windows and
``q_value_band_stats`` — and must be bounded (clamp open-ended top bands
to the domain max before calling; an unbounded ``hi`` would explode into
an unbounded bucket sequence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join", "interval_overlap_pairs"]

_BUCKET = "__range_bucket"


def bucketed_range_join(
    facts: DataFrame,
    dims: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join ``facts`` rows to every ``dims`` interval containing them.

    Matches ``facts[value_col] ∈ [dims[lo_col], dims[hi_col])`` via a
    pure equi-join on bucket ids (see module docstring).  Returns the
    facts columns followed by the dims columns, exactly like
    ``facts.join(broadcast(dims), on=<range predicate>, how=how)`` —
    bit-identical output, different (scalable) physical plan.

    ``how``: ``inner`` or ``left_semi`` (membership test without dim
    payload — dedup/filter use cases).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    if how not in ("inner", "left_semi"):
        raise ValueError(f"how must be inner or left_semi, got {how}")

    w = F.lit(float(bucket_width))
    # F.floor(double) yields LONG: bucket ids are exact integers, so the
    # equi-join key never suffers float equality pitfalls.
    dim_buckets = F.sequence(
        F.floor(F.col(lo_col) / w),
        # floor(hi/w) over-covers by at most one bucket when hi sits on a
        # bucket boundary (the interval is open at hi); the refine
        # predicate below discards those rows, and the alternative
        # (hi - epsilon) would be float-fragile.
        F.floor(F.col(hi_col) / w),
    )
    d = dims.withColumn(_BUCKET, F.explode(dim_buckets))
    f = facts.withColumn(_BUCKET, F.floor(F.col(value_col) / w))

    refine: Column = (F.col(value_col) >= F.col(lo_col)) & (
        F.col(value_col) < F.col(hi_col)
    )
    if how == "left_semi":
        # semi join cannot carry the refine predicate after the fact, so
        # fold it into the join condition (still an equi-join on the
        # bucket plus a residual filter — hash-joinable).
        cond = (f[_BUCKET] == d[_BUCKET]) & (
            (f[value_col] >= d[lo_col]) & (f[value_col] < d[hi_col])
        )
        return f.join(d, cond, "left_semi").drop(_BUCKET)
    return f.join(d, _BUCKET, "inner").filter(refine).drop(_BUCKET)


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs of rows whose CLOSED integer intervals
    ``[start_col, end_col]`` overlap (within the same
    ``partition_cols`` group, if given) — the interval SELF-join, the
    primitive behind concurrent-session detection, shipment-window
    collision checks, and co-occurrence mining.

    The naive form is a quadratic theta-join Spark would plan as a
    cartesian product.  Scale shape here: each interval explodes into
    the fixed-width buckets it covers (amplification
    ``~width/bucket_width + 1``); candidates come from a plain hash
    equi-join on ``(partition_cols…, bucket)``; the exact overlap
    predicate (``a.start <= b.end AND b.start <= a.end``) re-filters
    collisions.  A pair overlapping across several shared buckets would
    match once per bucket, so a count-once gate keeps only the bucket
    containing ``greatest(a.start, b.start)`` (the overlap's left edge
    — by construction a bucket BOTH intervals cover): every true pair
    survives in exactly one bucket, no ``distinct`` shuffle needed.

    Returns one row per unordered pair (``a.id < b.id``) with the two
    ids, both intervals, and ``overlap_len`` (closed-interval day
    count).  Linear in data + candidate pairs; AQE handles skewed
    buckets like any equi-join.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(partition_cols or [])
    w = F.lit(int(bucket_width))
    e = df.select(
        *keys,
        F.col(id_col).alias("__id"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
    ).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(F.floor(F.col("__s") / w), F.floor(F.col("__e") / w))
        ),
    )
    a = e.select(
        *keys,
        F.col("__id").alias("id_a"),
        F.col("__s").alias("start_a"),
        F.col("__e").alias("end_a"),
        _BUCKET,
    )
    b = e.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col("__id").alias("id_b"),
        F.col("__s").alias("start_b"),
        F.col("__e").alias("end_b"),
        F.col(_BUCKET).alias("__bucket_b"),
    )
    cond = (F.col(_BUCKET) == F.col("__bucket_b")) & (F.col("id_a") < F.col("id_b"))
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__k_{k}"))
    overlap = (F.col("start_a") <= F.col("end_b")) & (
        F.col("start_b") <= F.col("end_a")
    )
    count_once = F.col(_BUCKET) == F.floor(
        F.greatest("start_a", "start_b") / w
    )
    return (
        a.join(b, cond, "inner")
        .filter(overlap & count_once)
        .select(
            *keys,
            "id_a",
            "id_b",
            "start_a",
            "end_a",
            "start_b",
            "end_b",
            (
                F.least("end_a", "end_b") - F.greatest("start_a", "start_b") + 1
            ).alias("overlap_len"),
        )
    )
