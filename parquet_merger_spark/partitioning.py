"""Scale-adaptive input fan-out for CPU-heavy row-local stages.

A parquet scan's task count comes from file splits (``maxPartitionBytes``
/ row-group boundaries), not from the work per row: a corpus that fits in
one row group arrives as ONE task no matter how many cores the session
has, and every narrow operator chained on the scan — shingle builds,
signature kernels, decode UDFs — then runs single-threaded while the
rest of the cluster idles (the "input skew / one unsplittable file"
pathology, optimization guide §2.5; measured at sf0.1: the minhash
signature stage ran 6.3s on one task vs 1.2s spread over 32).

:func:`fan_out` is the guide's remedy ("repartition immediately after
the read"), made SCALE-ADAPTIVE: it round-robin-repartitions only when
the input's partition count is below the session's default parallelism.
At 100 TB a scan arrives as thousands of splits and the helper is a
structural no-op — no exchange is ever added on the path where it would
hurt.  Round-robin ``repartition(n)`` is retry-deterministic (Spark
sorts before round-robin partitioning, SPARK-23207) and every caller is
a row-local kernel whose downstream aggregations are
partitioning-independent (pinned by the DETERMINISM sweeps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Spread ``df`` across at least the session's default parallelism
    before a CPU-heavy row-local stage; no-op when the input already has
    that many partitions (any real at-scale scan)."""
    if df.isStreaming:
        # no .rdd on streaming plans; micro-batch parallelism is the
        # stream's own partitioning concern
        return df
    target = min_parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
