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

__all__ = ["bucketed_range_join"]

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
