"""Behavioral-analytics operators (operators/analytics.py): hand-built
frames pinning the edge semantics the sf0.01 oracle can't isolate —
funnel strict ordering, cohort week arithmetic, LOCF carry rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_merger_spark.operators.analytics import (
    funnel_steps,
    gapfill_locf,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_epoch long"
    )


def test_funnel_strict_ordering(spark):
    e = _ev(
        spark,
        [
            # u1: full conversion in order
            (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
            # u2: click BEFORE first view -> click stage must be null
            (2, "click", 50), (2, "view", 100),
            # u3: purchase before click -> purchase stage null, click ok
            (3, "view", 10), (3, "purchase", 20), (3, "click", 30),
            # u4: never viewed -> excluded entirely (no stage-1 row)
            (4, "click", 10), (4, "purchase", 20),
        ],
    )
    got = {
        r["user_id"]: (r["view_epoch"], r["click_epoch"], r["purchase_epoch"])
        for r in funnel_steps(e, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        1: (100, 200, 300),
        2: (100, None, None),
        3: (10, 30, None),
    }


def test_funnel_earliest_qualifying_not_earliest_overall(spark):
    """The stage-2 timestamp is the earliest click AFTER the first view,
    not the user's earliest click overall."""
    e = _ev(
        spark,
        [(1, "view", 100), (1, "click", 90), (1, "click", 150), (1, "click", 120)],
    )
    row = funnel_steps(e, ["view", "click"]).collect()[0]
    assert (row["view_epoch"], row["click_epoch"]) == (100, 120)


def test_retention_cohort_arithmetic(spark):
    week = 604800
    e = _ev(
        spark,
        [
            # u1 first event mid-week-1000; active offsets 0 and 2
            (1, "view", 1000 * week + 5), (1, "view", 1000 * week + 10),
            (1, "view", 1002 * week + 6),
            # u2 same cohort week, active offset 0 only
            (2, "view", 1000 * week + 999),
        ],
    )
    got = {
        (r["cohort_week_epoch"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(e).collect()
    }
    assert got == {(1000 * week, 0): 2, (1000 * week, 2): 1}


def test_gapfill_locf_carries_and_flags(spark):
    daily = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (1, "2024-01-04", 40.0),
            (2, "2024-02-01", 7.0),
        ],
        "k long, day string, v double",
    ).withColumn("day", F.col("day").cast("timestamp"))
    out = gapfill_locf(daily, "k", "day", "v").select(
        "k", F.date_format("day", "yyyy-MM-dd").alias("d"), "v_filled", "observed"
    )
    got = sorted((r["k"], r["d"], r["v_filled"], r["observed"]) for r in out.collect())
    assert got == [
        (1, "2024-01-01", 10.0, True),
        (1, "2024-01-02", 10.0, False),
        (1, "2024-01-03", 10.0, False),
        (1, "2024-01-04", 40.0, True),
        (2, "2024-02-01", 7.0, True),  # single-day key: no synthesized rows
    ]


def test_robust_outliers_mad_zero_group_matches_oracle(spark, tmp_path):
    """A group where >=50% of values are identical has MAD=0: unguarded,
    Spark's double division emits Infinity while DuckDB's zero-division
    behavior is version-dependent — the guard must exclude such groups
    identically in both engines (ADVICE r02)."""
    import duckdb
    import pandas as pd

    from parquet_merger_spark.queries import ORACLE_SQL, q_robust_outliers

    ts = pd.Timestamp("2024-01-01")
    rows = (
        # 'const': 9 identical values + 1 extreme -> MAD=0 -> group excluded
        [(i, ts, i, "const", 5.0, "{}") for i in range(9)]
        + [(9, ts, 9, "const", 900.0, "{}")]
        # 'var': a spread + one extreme -> flagged by the normal path
        + [(100 + i, ts, i, "var", float(i), "{}") for i in range(20)]
        + [(999, ts, 999, "var", 1000.0, "{}")]
    )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    got = q_robust_outliers(spark, str(tmp_path)).toPandas()
    assert not (got["event_type"] == "const").any(), got
    assert 999 in set(got["event_id"])
    assert not got["mz"].apply(lambda v: v != v or v == float("inf")).any()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    ddf = con.execute(ORACLE_SQL["robust_outliers"]).df()
    con.close()
    assert sorted(got["event_id"]) == sorted(ddf["event_id"])


def test_gapfill_locf_null_valued_observation_is_observed(spark):
    """A genuinely recorded row whose value is NULL reports
    observed=true (presence-based marker), with the previous value
    carried into the filled column — distinguishable from a synthesized
    calendar row, which is observed=false."""
    daily = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", None), (1, "2024-01-04", 40.0)],
        "k long, day string, v double",
    ).withColumn("day", F.col("day").cast("timestamp"))
    out = gapfill_locf(daily, "k", "day", "v").select(
        "k", F.date_format("day", "yyyy-MM-dd").alias("d"), "v_filled", "observed"
    )
    got = sorted((r["k"], r["d"], r["v_filled"], r["observed"]) for r in out.collect())
    assert got == [
        (1, "2024-01-01", 10.0, True),
        (1, "2024-01-02", 10.0, True),   # recorded null: observed, carried
        (1, "2024-01-03", 10.0, False),  # synthesized gap
        (1, "2024-01-04", 40.0, True),
    ]
