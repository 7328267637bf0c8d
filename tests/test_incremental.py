"""Keyed upsert: last-write-wins semantics, append path, schema guard.
The realistic refresh batch is oracle-checked differentially
(test_oracle.py::test_oracle_match[upsert_orders])."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.incremental import upsert_by_key  # noqa: E402


def test_update_wins_and_untouched_rows_pass_through(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, x double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, x double"
    )
    out = {r.k: (r.v, r.x) for r in upsert_by_key(base, updates, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_is_partitioning_independent(spark):
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, x double"
    )
    updates = spark.createDataFrame(
        [(i, -1.0) for i in range(0, 100, 7)], "k long, x double"
    )
    a = sorted((r.k, r.x) for r in upsert_by_key(base, updates, ["k"]).collect())
    b = sorted(
        (r.k, r.x)
        for r in upsert_by_key(base.repartition(13), updates.repartition(3), ["k"]).collect()
    )
    assert a == b


def test_upsert_rejects_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    updates = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="updates lacks"):
        upsert_by_key(base, updates, ["k"])
