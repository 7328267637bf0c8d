"""As-of (point-in-time) join — an operator the reference lacks and Spark
has no built-in for (SURVEY §2.3: the reference has no joins at all; this
is part of the LLM/analytics extension surface).

The classic need: for every left row (an order, a model-training example,
a feature request) attach the most recent right-side state at or before
the left row's timestamp (last event, last price, last label).

Naive formulations explode: a range join (``l.key = r.key AND r.ts <=
l.ts``) makes Spark enumerate every qualifying right row per left row and
aggregate the max — O(|matches|) intermediate rows and usually a
broadcast-nested-loop plan.  The scalable idiom used here is the
UNION + WINDOW pass:

1. tag left rows side=1, right rows side=0, align schemas (null-fill);
2. one window per key ordered by (ts, side) — right rows sort before
   left rows at equal ts, making the join inclusive (<=);
3. ``last(right_col, ignorenulls=True)`` over unbounded-preceding rows
   carries the latest right payload forward onto each left row;
4. keep side=1 rows.

One shuffle on the key, O(n log n) sort per partition, zero
intermediate-row blowup — the same plan shape at 100 TB.  Differentially
tested against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_no_overlap(left: DataFrame, right_cols: list[str]) -> None:
    """Reject right_cols that collide with the left schema: select()
    happily emits DUPLICATE column names and the caller's next reference
    fails with AMBIGUOUS_REFERENCE far from the cause — pre-alias the
    right payload instead (the blocked_fuzzy_join convention)."""
    clash = sorted(set(right_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"right_cols {clash} collide with left columns; alias them first"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``right_cols`` from the
    ``right`` row with the greatest ``right_ts`` <= ``left_ts`` for the
    same ``on`` key; nulls when no such row exists.

    ``left_ts``/``right_ts`` may be timestamps or any orderable numeric
    (epoch seconds keep cross-engine comparisons exact).  The right side
    must be unique per (on, right_ts) — deduplicate first (e.g.
    ``exact_dedup``) or the carried row is the max-ts one with an
    unspecified tie among equals.

    The right payload travels as ONE STRUCT, for two correctness reasons:
    a struct whose fields are all NULL is still a non-null struct, so a
    matched right row with genuinely-NULL values is carried (ignorenulls
    must only skip the union's null-fill rows, never a real match); and
    every output column comes from the SAME right row (carrying columns
    independently could stitch values from different rows whenever one
    column is NULL in the nearest match).
    """
    _check_no_overlap(left, right_cols)
    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__t"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        )
        .withColumn("__side", F.lit(0))
    )
    # unionByName null-fills the disjoint payload columns; this is schema
    # mechanics internal to the operator, not merge semantics (the engine's
    # user-facing merge keeps its intersection contract).
    combined = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out_cols: list[Column] = [carried[c].alias(c) for c in right_cols]
    return (
        combined.select(*left.columns, "__side", *out_cols)
        .filter(F.col("__side") == 1)
        .drop("__side")
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """FORWARD as-of join: every ``left`` row gains ``right_cols`` from
    the right row with the SMALLEST ``right_ts`` >= ``left_ts`` for the
    same key — "what happened next" (next price tick, next user action,
    the label-lookahead join in training-data builds), the mirror of
    :func:`asof_join`'s "latest state so far".

    Same union + single-window idiom and the same scale shape (one
    shuffle on the key, no range-join blowup), with the frame reversed:
    left rows tag side=0 so an equal-timestamp right row (side=1) sorts
    at-or-after them inside the (ts, side) order, and
    ``first(payload, ignorenulls=True)`` over [current row, unbounded
    following) picks the nearest future right payload inclusively.
    The right side must be unique per (on, right_ts), as in
    :func:`asof_join`.
    """
    _check_no_overlap(left, right_cols)
    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(0)
    )
    r_tagged = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__t"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        )
        .withColumn("__side", F.lit(1))
    )
    combined = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = F.first("__r", ignorenulls=True).over(w)
    out_cols: list[Column] = [carried[c].alias(c) for c in right_cols]
    return (
        combined.select(*left.columns, "__side", *out_cols)
        .filter(F.col("__side") == 0)
        .drop("__side")
    )
