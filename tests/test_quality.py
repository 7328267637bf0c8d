"""Profiling, expectation checking, quarantine, and hash splits."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.profile import (  # noqa: E402
    check_expectations,
    profile_table,
    quarantine,
)
from parquet_merger_spark.operators.sampling import split_by_hash  # noqa: E402


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -1.0), (3, "c", None), (3, "d", 5.0)],
        "id long, name string, score double",
    )


def test_profile_counts_nulls_and_distinct(spark):
    prof = {r["col_name"]: r for r in profile_table(_frame(spark)).collect()}
    assert prof["id"]["n_rows"] == 4
    assert prof["id"]["n_distinct"] == 3
    assert prof["name"]["n_nulls"] == 1
    assert prof["name"]["n_distinct"] == 3  # distinct skips nulls
    assert prof["score"]["min_str"] == "-1.0" and prof["score"]["max_str"] == "10.0"


def test_profile_approximate_mode_runs_single_job(spark):
    prof = profile_table(_frame(spark), approximate=True)
    got = {r["col_name"]: r["n_distinct"] for r in prof.collect()}
    assert got["id"] in (2, 3, 4)  # HLL estimate near truth on tiny input


def test_expectations_null_predicate_is_violation(spark):
    rep = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(
            _frame(spark),
            rules={
                "score_positive": F.col("score") > 0,  # null score -> violation
                "name_not_null": F.col("name").isNotNull(),
            },
            unique_keys={"id_unique": ["id"]},
        ).collect()
    }
    assert rep == {"score_positive": 2, "name_not_null": 1, "id_unique": 1}


def test_quarantine_partitions_and_tags(spark):
    valid, bad = quarantine(
        _frame(spark),
        rules={
            "score_positive": F.col("score") > 0,
            "name_not_null": F.col("name").isNotNull(),
        },
    )
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    tags = {r["id"]: sorted(r["violated"]) for r in bad.collect()}
    assert tags == {2: ["name_not_null", "score_positive"], 3: ["score_positive"]}
    assert valid.count() + bad.count() == 4


def test_split_by_hash_disjoint_exhaustive_stable(spark):
    d = spark.range(2_000).withColumnRenamed("id", "doc_id")
    s1 = split_by_hash(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2_000  # exhaustive
    assert 0.7 < counts["train"] / 2_000 < 0.9  # roughly proportional
    # stable under growth: the first 1000 ids keep their split when 1000 more arrive
    small = {r["doc_id"]: r["split"] for r in split_by_hash(
        spark.range(1_000).withColumnRenamed("id", "doc_id"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).collect()}
    big = {r["doc_id"]: r["split"] for r in s1.filter("doc_id < 1000").collect()}
    assert small == big
    # shuffle-free plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
