"""Unit edge-cases for the as-of join (the oracle covers the bulk query)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.asof import asof_join  # noqa: E402


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_picks_latest_at_or_before(spark):
    left = _df(spark, [(1, 100), (1, 205), (1, 300)], "k long, t long")
    right = _df(
        spark,
        [(1, 100, "a"), (1, 200, "b"), (1, 250, "c")],
        "k long, t long, payload string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["payload"])
    got = {(r.t, r.payload) for r in out.collect()}
    # t=100 matches the equal-ts right row (inclusive <=)
    assert got == {(100, "a"), (205, "b"), (300, "c")}


def test_asof_left_rows_without_match_get_nulls(spark):
    left = _df(spark, [(1, 50), (2, 99)], "k long, t long")
    right = _df(spark, [(1, 100, "late")], "k long, t long, payload string")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["payload"])
    assert {(r.k, r.payload) for r in out.collect()} == {(1, None), (2, None)}


def test_asof_keys_do_not_leak_across_groups(spark):
    left = _df(spark, [(1, 200), (2, 200)], "k long, t long")
    right = _df(
        spark, [(1, 100, "for-k1"), (2, 150, "for-k2")], "k long, t long, payload string"
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["payload"])
    assert {(r.k, r.payload) for r in out.collect()} == {(1, "for-k1"), (2, "for-k2")}


def test_asof_carries_null_payload_of_true_match(spark):
    """A matched right row whose payload is NULL must be carried as NULL —
    not skipped in favor of an older non-null row — and all output columns
    must come from the SAME right row."""
    left = _df(spark, [(1, 25)], "k long, t long")
    right = _df(
        spark,
        [(1, 10, 5.0, 1), (1, 20, None, 2)],
        "k long, t long, price double, qty long",
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", right_cols=["price", "qty"]
    ).collect()
    assert len(out) == 1
    # the ts=20 row is the match: price NULL, qty 2 (never price=5/qty=2)
    assert out[0].price is None and out[0].qty == 2


def test_chunk_no_redundant_tail_when_chunk_covers_doc(spark):
    """A doc exactly chunk_tokens long yields ONE chunk even with overlap
    (the would-be second start emits pure duplicate text)."""
    from parquet_merger_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(64)))], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=8).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 64


def test_salted_join_rejects_right_preserving_how(spark):
    import pytest
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.ranking import salted_join

    df = spark.createDataFrame([(1, 1)], "k long, v long")
    # ValueError since r09 (semantic guards survive python -O)
    with pytest.raises(ValueError, match="salt copies"):
        salted_join(df, df, ["k"], salt_from=F.xxhash64("v"), how="full")


# ---------------------------------------------------------------------------
# bucketed range join (operators/rangejoin.py)
# ---------------------------------------------------------------------------


def _range_fixtures(spark):
    from pyspark.sql import functions as F

    facts = spark.range(0, 500).select(
        F.col("id").alias("fact_id"),
        ((F.col("id") * 37 % 1000) / F.lit(4.0)).alias("v"),  # 0.25 grid
    )
    dims = spark.range(0, 40).select(
        F.col("id").alias("band"),
        (F.col("id") * F.lit(6.25)).alias("lo"),
        ((F.col("id") + 1) * F.lit(6.25)).alias("hi"),
    )
    return facts, dims


def test_bucketed_range_join_matches_nested_loop(spark):
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    facts, dims = _range_fixtures(spark)
    got = bucketed_range_join(facts, dims, "v", "lo", "hi", bucket_width=4.0)
    ref = facts.join(
        F.broadcast(dims),
        (facts.v >= dims.lo) & (facts.v < dims.hi),
    )
    canon = lambda df: sorted(  # noqa: E731
        (r.fact_id, r.band) for r in df.select("fact_id", "band").collect()
    )
    assert canon(got) == canon(ref) and len(canon(got)) == 500


def test_bucketed_range_join_plan_is_equi_join(spark):
    """The point of the operator: NO nested-loop join in the plan — the
    dim side need not be broadcastable."""
    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    facts, dims = _range_fixtures(spark)
    out = bucketed_range_join(facts, dims, "v", "lo", "hi", bucket_width=4.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_bucketed_range_join_semi_and_boundaries(spark):
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    facts = spark.createDataFrame(
        [(0, 0.0), (1, 6.25), (2, 249.99), (3, 250.0), (4, -0.5)],
        "fact_id long, v double",
    )
    _, dims = _range_fixtures(spark)
    kept = bucketed_range_join(
        facts, dims, "v", "lo", "hi", bucket_width=4.0, how="left_semi"
    )
    ids = sorted(r.fact_id for r in kept.collect())
    # half-open [lo, hi): 250.0 == top hi is OUT; -0.5 below domain is OUT;
    # 6.25 sits exactly on an interior boundary -> exactly one band.
    assert ids == [0, 1, 2]
    assert sorted(kept.columns) == ["fact_id", "v"]

    inner = bucketed_range_join(facts, dims, "v", "lo", "hi", bucket_width=4.0)
    b = {r.fact_id: r.band for r in inner.collect()}
    assert b == {0: 0, 1: 1, 2: 39}


def test_bucketed_range_join_property(spark):
    """Property-based equivalence: for arbitrary interval sets (possibly
    overlapping, degenerate lo==hi, disjoint from all facts) and
    arbitrary bucket widths, the bucketized equi-join emits EXACTLY the
    pairs of the naive range predicate.  Values stay on a 0.25 grid so
    every boundary comparison is float-exact."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    quarters = st.integers(min_value=-200, max_value=200)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        vals=st.lists(quarters, min_size=1, max_size=30),
        ivs=st.lists(
            st.tuples(quarters, st.integers(min_value=0, max_value=60)),
            min_size=1,
            max_size=12,
        ),
        width_q=st.integers(min_value=1, max_value=40),
    )
    def check(vals, ivs, width_q):
        facts = spark.createDataFrame(
            [(i, v / 4.0) for i, v in enumerate(vals)], "fact_id long, v double"
        )
        dims = spark.createDataFrame(
            [(j, lo / 4.0, (lo + w) / 4.0) for j, (lo, w) in enumerate(ivs)],
            "band long, lo double, hi double",
        )
        got = sorted(
            (r.fact_id, r.band)
            for r in bucketed_range_join(
                facts, dims, "v", "lo", "hi", bucket_width=width_q / 4.0
            )
            .select("fact_id", "band")
            .collect()
        )
        ref = sorted(
            (r.fact_id, r.band)
            for r in facts.join(
                F.broadcast(dims), (facts.v >= dims.lo) & (facts.v < dims.hi)
            )
            .select("fact_id", "band")
            .collect()
        )
        assert got == ref

    check()


def test_bucketed_range_join_rejects_bad_args(spark):
    import pytest

    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    facts, dims = _range_fixtures(spark)
    with pytest.raises(ValueError, match="bucket_width"):
        bucketed_range_join(facts, dims, "v", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="how"):
        bucketed_range_join(
            facts, dims, "v", "lo", "hi", bucket_width=1.0, how="left"
        )


def test_bucketed_range_join_empty_sides(spark):
    from parquet_merger_spark.operators.rangejoin import bucketed_range_join

    facts, dims = _range_fixtures(spark)
    no_facts = facts.filter("fact_id < 0")
    no_dims = dims.filter("band < 0")
    assert bucketed_range_join(no_facts, dims, "v", "lo", "hi", 4.0).count() == 0
    assert bucketed_range_join(facts, no_dims, "v", "lo", "hi", 4.0).count() == 0


# ---------------------------------------------------------------------------
# asof_join_forward ("what happened next")
# ---------------------------------------------------------------------------


def _fwd_fixtures(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 250), (3, 20, 400)],
        "lid long, key long, lts long",
    )
    right = spark.createDataFrame(
        [(10, 100, "a"), (10, 300, "b"), (20, 390, "c")],
        "key long, rts long, tag string",
    )
    return left, right


def test_asof_forward_picks_nearest_future(spark):
    from parquet_merger_spark.operators.asof import asof_join_forward

    left, right = _fwd_fixtures(spark)
    got = {
        r.lid: r.tag
        for r in asof_join_forward(
            left, right, on="key", left_ts="lts", right_ts="rts", right_cols=["tag"]
        ).collect()
    }
    # lid=1 at ts 100: the EQUAL-ts right row matches (inclusive >=)
    # lid=2 at ts 250: skips the past row (100), takes 300
    # lid=3 at ts 400: no future right row -> null
    assert got == {1: "a", 2: "b", 3: None}


def test_asof_forward_carries_whole_row_not_stitched_columns(spark):
    from parquet_merger_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame([(1, 10, 0)], "lid long, key long, lts long")
    right = spark.createDataFrame(
        [(10, 5, None, "early"), (10, 9, 99, "late")],
        "key long, rts long, x int, tag string",
    )
    # nearest future row (rts=5... both are past? no: lts=0, so rts=5 is
    # future) has x=NULL: the NULL must be carried, not replaced by the
    # later row's 99
    row = asof_join_forward(
        left, right, on="key", left_ts="lts", right_ts="rts",
        right_cols=["x", "tag"],
    ).collect()[0]
    assert row.tag == "early" and row.x is None


# ---------------------------------------------------------------------------
# q_asof_join_nearest (r11 single-pass restructure): brute-force pin
# ---------------------------------------------------------------------------


def test_asof_nearest_matches_bruteforce(spark):
    """The r11 single union+window plan must agree with a brute-force
    min-|gap| computation on every order: the nearest gap is minimal,
    ties go backward, and orders whose customer has no events stay
    unmatched.  Pins the RANGE-frame semantics (equal-epoch events are
    inclusive in BOTH directions) independently of the oracle suite."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["asof_join_nearest"](spark, sf)

    o = out.select("o_orderkey", "o_custkey", "order_epoch",
                   "nearest_event_epoch", "direction")
    e = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select(
            F.col("user_id").alias("o_custkey"),
            F.col("ts").cast("timestamp").cast("long").alias("event_epoch"),
        )
        .distinct()
    )
    # brute force: every (order, event) pair for the customer -> min |gap|
    brute = (
        o.select("o_orderkey", "o_custkey", "order_epoch")
        .join(e, "o_custkey", "left")
        .groupBy("o_orderkey")
        .agg(
            F.min(F.abs(F.col("event_epoch") - F.col("order_epoch"))).alias(
                "min_gap"
            )
        )
    )
    j = o.join(brute, "o_orderkey").collect()
    assert len(j) > 0
    for r in j:
        if r.nearest_event_epoch is None:
            assert r.min_gap is None and r.direction is None
            continue
        gap = abs(r.nearest_event_epoch - r.order_epoch)
        assert gap == r.min_gap, (r.o_orderkey, gap, r.min_gap)
        # backward preferred on exact two-sided ties
        if r.direction == "forward":
            assert r.nearest_event_epoch > r.order_epoch
            # a backward event at the same distance would have won
        else:
            assert r.nearest_event_epoch <= r.order_epoch
