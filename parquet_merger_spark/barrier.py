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

ACCUMULATION (r10, advisor finding): Spark never deletes reliable
checkpoint files by default — with a dir set, every per-iteration cut
(dedup_clusters / pagerank / k-core / BPE rounds) and every
per-micro-batch cut (``near_dedup_batch_apply``) leaves an ``rdd-*``
directory behind, growing the checkpoint dir without bound on long
jobs.  ``session.get_spark`` therefore sets
``spark.cleaner.referenceTracking.cleanCheckpoints=true``: the
ContextCleaner deletes a checkpoint's files once its RDD becomes
unreachable on the driver, which is one iteration later for every
barrier in this package (each round's frame replaces the previous
round's reference).  Sessions built elsewhere should set the same conf
— it is a SparkConf (context-creation-time) setting, not a runtime SQL
conf.  The final returned frame's checkpoint stays alive as long as the
caller holds the DataFrame, exactly as intended.
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
