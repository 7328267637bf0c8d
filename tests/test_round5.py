"""Round-5 widening batch: behavior pins the corpus-wide oracle compare
cannot see — crafted-input semantics (known OLS slope, known Jaccard,
cross-source duplicate accounting, single-language Gini) plus the
TakeOrdered plan pin for the coverage curve.  (Cross-engine value
equality for all six new keys runs in test_oracle.py via ORACLE_SQL.)"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


def test_token_coverage_takeordered_plan(spark):
    """The top-1000 survivor selection must be TakeOrdered (per-partition
    heap), never a global sort of the full vocabulary."""
    from parquet_merger_spark.queries import QUERIES

    plan = (
        QUERIES["token_coverage_curve"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # no unpartitioned full-data Sort feeding a window over the raw
    # token stream: the only window input is the 1000-row survivor set
    assert plan.count("Exchange SinglePartition") <= 1


def test_token_coverage_monotone(spark):
    """Coverage is nondecreasing in k and within (0, 1]."""
    from parquet_merger_spark.queries import QUERIES

    rows = (
        QUERIES["token_coverage_curve"](spark, SF_DIR).orderBy("k").collect()
    )
    assert [r["k"] for r in rows] == sorted(r["k"] for r in rows)
    covs = [r["coverage"] for r in rows]
    assert all(0.0 < c <= 1.0 for c in covs)
    assert covs == sorted(covs)
    for r in rows:
        assert r["cum_tokens"] <= r["total_tokens"]


def test_lang_gini_single_and_uniform(spark, tmp_path):
    """A single-language source has Gini 0; a perfectly uniform
    two-language source has Gini 0.5 exactly."""
    from parquet_merger_spark.queries import QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": ["t"] * 8,
            "lang": ["en", "en", "en", "en", "en", "de", "en", "de"],
            "source": ["mono"] * 4 + ["duo"] * 4,
            "n_chars": [1] * 8,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = {
        r["source"]: r
        for r in QUERIES["lang_gini_by_source"](spark, str(tmp_path)).collect()
    }
    assert out["mono"]["gini"] == 0.0 and out["mono"]["n_langs"] == 1
    assert out["duo"]["gini"] == 0.5 and out["duo"]["n_langs"] == 2


def test_revenue_trend_exact_slope(spark, tmp_path):
    """Orders manufactured on an exact line (monthly revenue = 100.00 +
    10.00 * month_index dollars) must recover slope 1000 cents/month
    exactly — the integer-sum OLS has no rounding to hide behind."""
    from parquet_merger_spark.queries import QUERIES

    months = list(range(6))
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, 7),
            "o_custkey": [1] * 6,
            "o_orderstatus": ["F"] * 6,
            "o_totalprice": [100.0 + 10.0 * m for m in months],
            # micro (not nano) precision: the real fixture tables ship
            # timestamp[us]; Spark 4 reads TIMESTAMP(NANOS) as BIGINT
            "o_orderdate": pd.Series(
                [pd.Timestamp(f"1992-{m + 1:02d}-15") for m in months]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 6,
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [1],
            "c_name": ["c1"],
            "c_nationkey": [0],
            "c_acctbal": [0.0],
            "c_mktsegment": ["BUILDING"],
        }
    )
    nation = pd.DataFrame(
        {"n_nationkey": [0], "n_name": ["TESTLAND"], "n_regionkey": [0]}
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    customer.to_parquet(tmp_path / "customer.parquet", index=False)
    nation.to_parquet(tmp_path / "nation.parquet", index=False)
    rows = QUERIES["revenue_trend_by_nation"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["n_name"] == "TESTLAND"
    assert rows[0]["n_months"] == 6
    assert rows[0]["slope_cents_per_month"] == 1000.0


def test_latest_order_matches_window_idiom(spark):
    """The packed-max aggregate must agree row-for-row with the plain
    row_number window on real data — the scale idiom changes the plan,
    never the answer."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES, _t

    fast = {
        r["o_custkey"]: (r["last_date"], r["last_orderkey"], r["n_orders"])
        for r in QUERIES["latest_order_per_customer"](spark, SF_DIR).collect()
    }
    o = _t(spark, SF_DIR, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(F.col("o_orderdate").cast("date")), F.desc("o_orderkey")
    )
    ref_rows = (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_orders", F.count(F.lit(1)).over(Window.partitionBy("o_custkey"))
        )
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").cast("string").alias("d"),
            "o_orderkey",
            "n_orders",
        )
        .collect()
    )
    ref = {
        r["o_custkey"]: (r["d"], r["o_orderkey"], r["n_orders"])
        for r in ref_rows
    }
    assert fast == ref


def test_jaccard_pairs_crafted(spark, tmp_path):
    """Three users, two types: A={u1,u2,u3}, B={u2,u3} -> |both|=2,
    |either|=3, jaccard 2/3; exactly one (a<b) pair row."""
    from parquet_merger_spark.queries import QUERIES

    events = pd.DataFrame(
        {
            "event_id": range(1, 7),
            "ts": [pd.Timestamp("2024-01-01")] * 6,
            "user_id": [1, 2, 3, 2, 3, 3],
            "event_type": ["A", "A", "A", "B", "B", "B"],
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    events.to_parquet(tmp_path / "events.parquet", index=False)
    rows = QUERIES["jaccard_event_type_pairs"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"], r["n_both"]) == ("A", "B", 2)
    assert r["jaccard"] == round(2 / 3, 6)


def test_dup_rate_cross_source_accounting(spark, tmp_path):
    """A text duplicated ACROSS sources counts as a duplicate in both
    sources (multiplicity is corpus-wide, not per-source)."""
    from parquet_merger_spark.queries import QUERIES

    docs = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": ["same", "same", "only-a", "only-b"],
            "lang": ["en"] * 4,
            "source": ["a", "b", "a", "b"],
            "n_chars": [4, 4, 6, 6],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = {
        r["source"]: r
        for r in QUERIES["dup_rate_by_source"](spark, str(tmp_path)).collect()
    }
    for s in ("a", "b"):
        assert out[s]["n_docs"] == 2
        assert out[s]["n_dup"] == 1
        assert out[s]["dup_rate"] == 0.5


def test_percentile_bands_no_per_type_sort(spark):
    """The r04 scale flag: band assignment must not funnel a whole
    event type through one ntile task.  Pin: no ntile anywhere, and
    every row-level window partitions by (event_type, __bucket) — the
    only event_type-alone windows run over the 64-row-per-type count
    table."""
    from parquet_merger_spark.queries import QUERIES

    df = QUERIES["percentile_bands_per_type"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    assert "row_number() windowspecdefinition(event_type" in plan
    for line in plan.splitlines():
        if "row_number() windowspecdefinition" in line:
            assert "__bucket" in line


def test_percentile_bands_matches_ntile(spark):
    """The bucketed-rank banding reproduces the plain tie-broken
    ntile(4) EXACTLY on real data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES, _events

    fast = {
        (r["event_type"], r["band"]): (r["n"], r["lo"], r["hi"])
        for r in QUERIES["percentile_bands_per_type"](spark, SF_DIR).collect()
    }
    e = _events(spark, SF_DIR)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ref_rows = (
        e.withColumn("band", F.ntile(4).over(w))
        .groupBy("event_type", "band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
        .collect()
    )
    ref = {
        (r["event_type"], r["band"]): (r["n"], r["lo"], r["hi"])
        for r in ref_rows
    }
    assert fast == ref


def test_ntile_quota_formula_property():
    """Property (pure Python, mirrors the integer expressions in
    q_percentile_bands_per_type): for any N >= 1 and every rank
    r in 1..N, the quota formula reproduces ntile(4)'s band — first
    N%4 bands hold ceil(N/4) rows, the rest floor(N/4) — and bands
    partition 1..N in order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def band(r: int, n: int) -> int:
        base, rem = n // 4, n % 4
        head = rem * (base + 1)
        if r <= head:
            return (r + base) // (base + 1)
        safe = max(base, 1)
        return rem + (r - head + safe - 1) // safe

    def ntile_ref(n: int) -> list[int]:
        base, rem = n // 4, n % 4
        out = []
        for b in range(1, 5):
            out.extend([b] * (base + (1 if b <= rem else 0)))
        return out

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=4000))
    def check(n):
        assert [band(r, n) for r in range(1, n + 1)] == ntile_ref(n)

    check()
