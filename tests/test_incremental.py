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


def test_snapshot_diff_labels_and_null_transitions(spark):
    from parquet_merger_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (5, None)], "id long, v string"
    )
    got = {r["id"]: (r["change"], r["v"]) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {
        2: ("update", "B"),       # value change -> new side value
        3: ("update", "c"),       # NULL -> value counts as change
        4: ("delete", "d"),       # delete carries old side value
        5: ("insert", None),      # insert with NULL value
    }
    # id 1 unchanged -> absent


def test_snapshot_diff_empty_when_identical(spark):
    from parquet_merger_spark.operators.incremental import snapshot_diff

    df = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    same = spark.createDataFrame([(1, 1.0), (2, None)], "id long, v double")
    assert snapshot_diff(df, same, ["id"]).count() == 0  # null==null is no change


def test_snapshot_diff_roundtrips_through_upsert(spark):
    # applying the diff's inserts+updates via upsert, then removing
    # deletes, reconstructs the new snapshot exactly
    from parquet_merger_spark.operators.incremental import snapshot_diff, upsert_by_key

    old = spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double")
    new = spark.createDataFrame(
        [(i, float(i) + (1.5 if i % 7 == 0 else 0.0)) for i in range(5, 105)],
        "id long, v double",
    )
    diff = snapshot_diff(old, new, ["id"])
    ups = diff.filter("change != 'delete'").drop("change")
    dels = diff.filter("change = 'delete'").select("id")
    rebuilt = upsert_by_key(old, ups, ["id"]).join(dels, "id", "left_anti")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


# ---------------------------------------------------------------------------
# SCD type-2 (scd2_from_snapshots)
# ---------------------------------------------------------------------------


def test_scd2_versions_and_intervals(spark):
    from parquet_merger_spark.operators.incremental import scd2_from_snapshots

    snaps = spark.createDataFrame(
        [
            # key 1: value changes at snap 2, reverts at snap 3 -> 3 versions
            (1, "a", 1), (1, "b", 2), (1, "a", 3),
            # key 2: never changes -> one open version
            (2, "x", 1), (2, "x", 2), (2, "x", 3),
            # key 3: appears first at snap 2 (late arrival)
            (3, "n", 2), (3, "n", 3),
            # key 4: null -> value transition (null-safe comparison)
            (4, None, 1), (4, "v", 2),
        ],
        "k long, val string, snap_id int",
    )
    out = scd2_from_snapshots(snaps, ["k"], ["val"])
    got = sorted(
        ((r["k"], r["valid_from"]), (r["val"], r["valid_to"]))
        for r in out.collect()
    )
    assert got == [
        ((1, 1), ("a", 2)), ((1, 2), ("b", 3)), ((1, 3), ("a", None)),
        ((2, 1), ("x", None)),
        ((3, 2), ("n", None)),
        ((4, 1), (None, 2)), ((4, 2), ("v", None)),
    ]


def test_scd2_multi_tracked_columns_any_change_opens_version(spark):
    from parquet_merger_spark.operators.incremental import scd2_from_snapshots

    snaps = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "a", 20, 2), (1, "b", 20, 3)],
        "k long, seg string, bal long, snap_id int",
    )
    out = scd2_from_snapshots(snaps, ["k"], ["seg", "bal"])
    got = sorted((r["seg"], r["bal"], r["valid_from"], r["valid_to"])
                 for r in out.collect())
    assert got == [("a", 10, 1, 2), ("a", 20, 2, 3), ("b", 20, 3, None)]


def test_snapshot_diff_null_key_side_membership(spark):
    """Side membership comes from explicit presence markers: a null-key
    row only in OLD is a delete (key-nullness-based membership labeled it
    an insert carrying old values)."""
    from parquet_merger_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame([(None, "v"), (1, "x")], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    got = {(r.k, r.v, r.change) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {(None, "v", "delete")}, got
