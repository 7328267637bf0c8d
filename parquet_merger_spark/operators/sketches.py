"""Portable mergeable cardinality sketches (KMV / k-minimum-values).

The engine's other sketch key (``sketch_stats``) uses Spark's built-in
HLL++/quantile sketches — correct at scale but ENGINE-SPECIFIC, so it can
only be rows-only checked against DuckDB.  KMV closes that gap: keep the
``k`` smallest distinct hash values per group; with hashes uniform on
[0, p), the group's distinct count is estimated by ``(k-1) * p / h_k``
(Bar-Yossef et al. 2002, the classic bottom-k estimator).  Using the
repo's portable universal hash ``(a*x + c) mod p`` (every intermediate
< 2^61) the ENTIRE sketch — hashing, per-group bottom-k, merge, estimate
— is exact integer arithmetic any SQL engine reproduces bit-for-bit,
so the key carries a full DuckDB oracle.

Mergeability is LOSSLESS for the estimate: the global k smallest hash
values of a union are each among their own partition's k smallest, so
``merge(bottom_k(day) for day in month) == bottom_k(month)`` exactly —
pinned by ``tests/test_sketches.py``.  That is the property that lets a
100 TB pipeline maintain per-partition sketches (a few hundred bytes
each) and answer distinct-count rollups at any grain without rescanning:
the shuffle moves k longs per group, never the data.

Scale shape: one distinct on (group, hash) — the same key shuffle an
exact COUNT(DISTINCT) needs — then the skew-safe two-phase bottom-k
(:func:`~parquet_merger_spark.operators.ranking.topk_per_group_salted`),
so a single hot group never funnels through one task.  At 100 TB the
exact-distinct tier is what you replace: sketches for the dashboard
grains, exact only where the contract demands it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_merger_spark.operators.dedup import PORTABLE_HASH_AC, PORTABLE_MOD
from parquet_merger_spark.operators.ranking import topk_per_group_salted


def portable_hash64(col: Column, which: int = 0) -> Column:
    """The repo's portable universal hash over a non-negative int64 key,
    reduced mod p first so the multiply stays < 2^61 (exact everywhere)."""
    a, c = PORTABLE_HASH_AC[which]
    return F.pmod(
        F.lit(a) * F.pmod(col, F.lit(PORTABLE_MOD)) + F.lit(c),
        F.lit(PORTABLE_MOD),
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., rank, h): the ``k`` smallest DISTINCT portable-hash
    values of ``id_col`` per group — the serialized sketch, k longs per
    group.  rank is 1-based (rank k row carries h_k, the estimator's
    denominator)."""
    hashed = df.select(
        *group_cols, portable_hash64(F.col(id_col)).alias("h")
    ).distinct()
    return topk_per_group_salted(
        hashed,
        group_cols,
        [F.col("h").asc()],
        k,
        salt_col=F.xxhash64("h"),
    ).select(*group_cols, "rank", "h")


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """(group_cols..., n_est): distinct-count estimate per group from a
    :func:`kmv_sketch` frame.  Groups with fewer than k distinct values
    are EXACT (their sketch holds every hash): n_est = row count.
    Otherwise n_est = (k-1) * p div h_k — integer arithmetic, < 2^63.
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("__hk"),
    )
    est = F.when(F.col("__n") < k, F.col("__n")).otherwise(
        F.expr(f"CAST(({k} - 1) * CAST({PORTABLE_MOD} AS BIGINT) div __hk AS BIGINT)")
    )
    return agg.select(*group_cols, est.cast("long").alias("n_est"))


def kmv_merge(
    sketch: DataFrame,
    to_group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Re-aggregate sketches to a coarser grain (day -> month, source ->
    corpus): the k smallest of the unioned hash sets.  LOSSLESS: every
    member of the coarser bottom-k is in its finer group's bottom-k, so
    the result equals :func:`kmv_sketch` run directly at the coarse grain
    (equality pinned in tests).  Input rows are (group, rank, h); hashes
    repeated across fine groups (the same id seen on two days) collapse
    via distinct before re-ranking."""
    hashes = sketch.select(*to_group_cols, "h").distinct()
    return topk_per_group_salted(
        hashes,
        to_group_cols,
        [F.col("h").asc()],
        k,
        salt_col=F.xxhash64("h"),
    ).select(*to_group_cols, "rank", "h")
