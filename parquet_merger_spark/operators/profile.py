"""Data profiling and expectation (constraint) checking.

Before a 100 TB corpus feeds training, two metadata-sized questions gate
everything downstream: "what does this table actually look like?"
(profiling) and "does it satisfy the contract we assumed?"
(expectations).  Both reduce to aggregates — tiny outputs, one
distributed pass — so they belong in the engine, not a notebook.

Scale design notes:

* :func:`profile_table` computes every column's stats in ONE aggregate
  job (Catalyst plans the multi-distinct via a single expand + partial
  aggregation; there is no per-column scan).  Exact distinct counts are
  the oracle-checkable default; pass ``approximate=True`` at real scale
  to swap in HLL++ (`approx_count_distinct`) and keep the job one
  shuffle with constant-size state.
* :func:`check_expectations` evaluates all row rules in one
  conditional-count aggregate (one scan for any number of rules);
  unique-key rules each add one groupBy on the key.  Violation COUNTS
  come back as a summary table; :func:`quarantine` splits the actual
  rows (valid, violating) for write-out — the standard
  gate-then-quarantine ingestion pattern.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, approximate: bool = False
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str)`` — one row per column, one aggregate job total.

    min/max are cast to string so heterogeneous column types fit one
    output schema (numeric formatting is engine-specific for floats;
    keep cross-engine comparisons to int/string/date columns)."""
    cols = columns or df.columns
    n_distinct = (
        (lambda c: F.approx_count_distinct(c)) if approximate else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            n_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"__rows_{c}").alias("n_rows"),
                    F.col(f"__nulls_{c}").alias("n_nulls"),
                    F.col(f"__dist_{c}").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_str"),
                    F.col(f"__max_{c}").alias("max_str"),
                )
                for c in cols
            ]
        )
    ).alias("p")
    return wide.select(stacked).select("p.*")


def numeric_histogram(
    df: DataFrame,
    col: str,
    n_bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Equal-width histogram of ``col`` over [lo, hi]:
    ``(bin, bin_lo, bin_hi, n)``.  Values outside the range are excluded
    (profile first; pass the observed envelope).  Row-local bin math +
    one small groupBy — the profiling complement that shows the SHAPE a
    min/max envelope can't.  ``hi`` lands in the last bin (closed top)."""
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_bins - 1),
    )
    return (
        df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


def check_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Violation summary ``(rule, n_violations)``: row ``rules`` map a
    name to a boolean Column that every valid row satisfies (NULL counts
    as a violation — an unevaluable contract is a broken contract);
    ``unique_keys`` maps a name to a key column list that must be
    duplicate-free (n_violations = rows beyond the first per duplicated
    key).  All row rules share one aggregate pass."""
    parts = []
    if rules:
        aggs = [
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")).alias(name)
            for name, cond in rules.items()
        ]
        wide = df.agg(*aggs)
        parts.append(
            wide.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("rule"),
                                F.col(name).alias("n_violations"),
                            )
                            for name in rules
                        ]
                    )
                ).alias("v")
            ).select("v.*")
        )
    for name, keys in (unique_keys or {}).items():
        dups = (
            df.groupBy(*keys)
            .agg((F.count(F.lit(1)) - 1).alias("extra"))
            .agg(F.coalesce(F.sum("extra"), F.lit(0)).alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        parts.append(dups)
    if not parts:
        raise ValueError("no rules given")
    return reduce(DataFrame.unionByName, parts)


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (valid, violating) against ALL row rules at once.
    Violating rows carry a ``violated`` array naming each failed rule —
    the quarantine side is written for inspection/repair, the valid side
    flows on.  One scan feeds both sides (same plan, opposite filters)."""
    checks = F.array(
        *[
            F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
            for name, cond in rules.items()
        ]
    )
    tagged = df.withColumn("violated", F.filter(checks, lambda x: x.isNotNull()))
    valid = tagged.filter(F.size("violated") == 0).drop("violated")
    bad = tagged.filter(F.size("violated") > 0)
    return valid, bad


def corr_matrix_exact(df: DataFrame, int_cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation over pre-quantized INTEGER columns —
    one row per column pair: ``(col_x, col_y, n, corr)``.

    Why not ``df.stat.corr`` / ``F.corr``: their streaming-moment
    accumulation is order-dependent in the last ulps, so results differ
    run-to-run under different partitionings and can never hash-match a
    second engine.  This computes the five sufficient statistics
    (sum x, sum y, sum xy, sum x2, sum y2) as EXACT integer sums in a
    single map-side-combined aggregate, then evaluates the closed-form
    correlation in double precision from those exact values — the same
    IEEE ops in any engine, bit-stable under any partitioning.

    Scale shape: one scan, one partial-aggregated reduce to a single
    row (O(k^2) columns of state, k = len(int_cols)), then a row-local
    explode into pair rows.  No shuffle of data rows at all.  Caller
    quantizes (e.g. cents as BIGINT) — quantization choice is a
    statistics decision, not something to hide in here.
    """
    if len(int_cols) < 2:
        raise ValueError("need >= 2 columns")
    aggs = [F.count(F.lit(1)).alias("n")]
    # square/cross sums fold in decimal(38,0), not int64: cents-scale
    # values (~1e7) over ~1e9 rows push sum(x*x) past 2^63 — the exact
    # regime the docstring promises exactness for (int64 would wrap
    # silently, or throw under the ANSI default)
    dec = "decimal(38,0)"
    for c in int_cols:
        aggs.append(F.sum(c).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c).cast(dec) * F.col(c)).alias(f"ss_{c}"))
    for i, a in enumerate(int_cols):
        for b in int_cols[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(dec) * F.col(b)).alias(f"sp_{a}_{b}")
            )
    g = df.agg(*aggs)

    def d(name: str) -> Column:
        return F.col(name).cast("double")

    pairs = []
    nn = d("n")
    for i, a in enumerate(int_cols):
        for b in int_cols[i + 1 :]:
            num = nn * d(f"sp_{a}_{b}") - d(f"s_{a}") * d(f"s_{b}")
            dx = nn * d(f"ss_{a}") - d(f"s_{a}") * d(f"s_{a}")
            dy = nn * d(f"ss_{b}") - d(f"s_{b}") * d(f"s_{b}")
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    F.col("n").alias("n"),
                    # NULL (not IEEE NaN) where correlation is undefined
                    # (zero-variance column): NaN poisons the
                    # cross-engine hash-match and diverges from the
                    # binary_auc NULL-for-undefined pattern
                    F.round(
                        F.when(
                            (dx > 0) & (dy > 0),
                            num / (F.sqrt(dx) * F.sqrt(dy)),
                        ),
                        6,
                    ).alias("corr"),
                )
            )
    return g.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")
