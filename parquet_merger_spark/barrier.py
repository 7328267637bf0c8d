"""Materialization barriers: lineage cuts for iterative operators.

Iterative plans (connected components, pagerank, k-core peeling, BPE
merge rounds) must cut lineage each round or the plan doubles per
iteration.  Two Spark mechanisms exist:

- ``DataFrame.localCheckpoint`` — blocks stored on the executors that
  computed them, NON-replicated: fast (no FS round trip), but an
  executor loss makes the blocks irrecoverable (lineage is severed, so
  the job dies instead of recomputing).  The right default for
  local[n] and for short-lived clusters where retry-the-query is the
  recovery story.
- ``DataFrame.checkpoint`` — blocks written to the RELIABLE checkpoint
  directory (HDFS/object store): survives executor loss, costs a write
  + read per barrier.  The right choice for long multi-hour 100 TB jobs
  where losing hour 3 of 6 to one preempted executor is unacceptable.

:func:`materialize` picks automatically: reliable when the session has
a checkpoint dir configured (``spark.sparkContext.setCheckpointDir``),
local otherwise — so a cluster deployment opts in with ONE line at
session setup and every operator barrier in this package follows, no
per-operator plumbing (r09; the caveat was documented at
``operators/dedup.py`` since r07 but nothing honored it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reliable_checkpoints_enabled(df_or_spark) -> bool:
    """True when the session has a reliable checkpoint dir configured."""
    spark = getattr(df_or_spark, "sparkSession", df_or_spark)
    return spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when the session has
    a checkpoint dir (cluster opt-in), ``localCheckpoint`` otherwise.

    ``eager=False`` defers the materializing job to the first action
    that touches the result (the one-job-per-round pattern in
    ``dedup_clusters``/``pagerank``)."""
    if reliable_checkpoints_enabled(df):
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """:func:`materialize` with ``eager=False`` — a named partial so call
    sites can stay method-chained via ``.transform(materialize_lazy)``."""
    return materialize(df, eager=False)
