"""Physical-plan digests: the scale-review checklist as code.

The round-4 audit (SURVEY §10) walked every headline plan counting the
node kinds that predict 100 TB behavior — shuffles, nested-loop joins,
Python eval boundaries, codegen spans.  This module ships that walk as a
reusable API so pipelines can pin their plan shape in tests
(``assert_scalable``) instead of discovering a regression in a
production bill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# node markers in Spark's explain output worth counting; each maps to a
# scale question ("how many times does the data cross the wire / leave
# the JVM / get compared all-pairs?")
_MARKERS = {
    "hash_exchanges": "Exchange hashpartitioning",
    "range_exchanges": "Exchange rangepartitioning",
    "single_partition_exchanges": "Exchange SinglePartition",
    "broadcast_exchanges": "BroadcastExchange",
    "broadcast_nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian_products": "CartesianProduct",
    "sort_merge_joins": "SortMergeJoin",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "python_evals": "ArrowEvalPython",
    "map_in_pandas": "MapInPandas",
    "grouped_pandas": "FlatMapGroupsInPandas",
    # the node a row-at-a-time F.udf produces: pickled per-row transfer,
    # no Arrow batching — the one anti-pattern this audit exists to
    # red-line (r08 verdict: the audit was blind to it).  NOTE: the
    # substring also matches BatchEvalPythonUDTF (the sanctioned UDTF
    # API surface, a DIFFERENT node class) — _count() separates them so
    # the scalar-UDF red line can stay unconditional
    "batch_python_evals": "BatchEvalPython",
    "batch_python_udtfs": "BatchEvalPythonUDTF",
}


def _count(plan: str) -> dict[str, int]:
    import re

    d = {name: plan.count(marker) for name, marker in _MARKERS.items()}
    # "BatchEvalPython" is a prefix of "BatchEvalPythonUDTF": keep the
    # scalar count pure so a UDTF never masks (or fakes) a row-UDF
    d["batch_python_evals"] -= d["batch_python_udtfs"]
    d["whole_stage_codegen"] = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return d


def _explain(df: DataFrame, mode: str = "simple") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def plan_digest(df: DataFrame) -> dict[str, int]:
    """Counts of scale-relevant physical nodes in ``df``'s plan.

    ``whole_stage_codegen`` counts DISTINCT codegen span ids from the
    simple-mode ``*(n)`` node prefixes (the literal ``WholeStageCodegen``
    node name only appears in formatted mode, so matching it against
    simple output would always read 0).

    AQE caveat: for an un-executed frame this digests the INITIAL plan
    (``isFinalPlan=false``).  Two consequences: (a) adaptive re-planning
    (skew-join splits, shuffle coalescing, SMJ→BHJ demotion) can change
    the runtime-final node mix — the red lines below are conservative
    under AQE, which removes exchanges and downgrades joins but never
    introduces CartesianProduct or SinglePartition funnels; (b) codegen
    spans are assigned per query-stage AT RUNTIME under AQE, so
    ``whole_stage_codegen`` reads 0 on an adaptive initial plan in every
    explain mode — the field is meaningful only with
    ``spark.sql.adaptive.enabled=false`` (how the codegen-width tests
    use it) or on a post-execution final plan.
    """
    return _count(_explain(df))


def assert_scalable(
    df: DataFrame,
    max_hash_exchanges: int | None = None,
    allow_nested_loop: bool = False,
    allow_python: bool = True,
    allow_single_partition: bool = False,
    allow_python_udtf: bool = False,
) -> dict[str, int]:
    """Raise AssertionError (with the offending counts) when the plan
    crosses a scale red line; returns the digest when it passes.

    Red lines: CartesianProduct is never acceptable; nested-loop joins
    only when the caller vouches the broadcast side is model-tiny;
    Exchange SinglePartition means a one-task global funnel (the
    no-partition-window pathology); an optional shuffle budget catches
    join-chain regressions.
    """
    d = plan_digest(df)
    problems = []
    if d["cartesian_products"]:
        problems.append(f"{d['cartesian_products']} CartesianProduct node(s)")
    if d["batch_python_evals"]:
        # unconditional — no allow_* escape hatch: a row-at-a-time Python
        # UDF (pickled per-row, no Arrow) is never acceptable in this
        # codebase; vectorized kernels must be pandas_udf/mapInPandas
        problems.append(
            f"{d['batch_python_evals']} BatchEvalPython node(s) "
            "(row-at-a-time F.udf — use a pandas_udf)"
        )
    if not allow_python_udtf and d["batch_python_udtfs"]:
        # UDTFs are the sanctioned user API for genuinely-Python table
        # logic, but still row-at-a-time: a caller must vouch the input
        # is bounded (as q_udtf_tokens does with its 100-doc slice)
        problems.append(
            f"{d['batch_python_udtfs']} BatchEvalPythonUDTF node(s) "
            "(row-at-a-time UDTF on an unvouched path)"
        )
    if not allow_nested_loop and d["broadcast_nested_loop_joins"]:
        problems.append(
            f"{d['broadcast_nested_loop_joins']} BroadcastNestedLoopJoin node(s)"
        )
    if not allow_single_partition and d["single_partition_exchanges"]:
        problems.append(
            f"{d['single_partition_exchanges']} Exchange SinglePartition node(s)"
        )
    if not allow_python and (
        d["python_evals"] or d["map_in_pandas"] or d["grouped_pandas"]
    ):
        problems.append("Python eval node(s) in a JVM-only plan")
    if max_hash_exchanges is not None and d["hash_exchanges"] > max_hash_exchanges:
        problems.append(
            f"{d['hash_exchanges']} hash exchanges > budget {max_hash_exchanges}"
        )
    if problems:
        raise AssertionError(
            "plan fails scale review: " + "; ".join(problems) + f"\ndigest={d}"
        )
    return d


def final_plan_digest(df: DataFrame) -> dict[str, int]:
    """Digest of the RUNTIME-FINAL adaptive plan: executes ``df`` via
    ``collect()`` (the one action that finalizes the frame's OWN query
    execution — a sink write runs a separate QueryExecution and leaves
    this frame's adaptive plan at ``isFinalPlan=false``), then counts
    nodes in the ``== Final Plan ==`` section — under AQE that is the
    tree after skew-join splits, shuffle coalescing, and SMJ->BHJ
    demotions, i.e. what actually ran (``plan_digest`` sees only the
    INITIAL plan of an unexecuted frame; its docstring details the gap).
    Whole-stage codegen spans are counted from the final tree's
    ``*(n)`` ids, which AQE only assigns at runtime — so this is also
    the one place codegen width is measurable with adaptive enabled.

    COLLECTS the frame to the driver — audit/test use on bounded or
    aggregated frames only, never on a production hot path.
    """
    df.collect()
    plan = _explain(df)
    # the AQE explain appends the pre-execution tree after the final one;
    # digest only what ran
    return _count(plan.split("== Initial Plan ==")[0])
