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
