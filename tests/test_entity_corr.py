"""Entity-resolution blocking (operators/entity.py) and exact-sufficient-
statistics correlation (operators/profile.corr_matrix_exact).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parquet_merger_spark.operators.entity import blocked_fuzzy_join
from parquet_merger_spark.operators.profile import corr_matrix_exact


def _frames(spark):
    probes = spark.createDataFrame(
        [(1, "smalx ring"), (2, "zed widget")], "probe_id long, probe_text string"
    )
    corpus = spark.createDataFrame(
        [(10, "small ring"), (11, "small bolt"), (12, "red widget")],
        "match_id long, match_text string",
    )
    return probes, corpus


def test_blocked_fuzzy_join_matches_within_block(spark):
    probes, corpus = _frames(spark)
    out = blocked_fuzzy_join(
        probes, corpus, "probe_text", "match_text",
        lambda c: F.substring(c, 1, 5), max_distance=2,
    )
    got = sorted((r["probe_id"], r["match_id"], r["distance"]) for r in out.collect())
    # probe 1 ("smalx ring") blocks with nothing: its 5-prefix "smalx"
    # differs from "small" — the documented blocking recall caveat.
    # probe 2 ("zed widget") vs "red widget": prefix "zed w" != "red w".
    assert got == []


def test_blocked_fuzzy_join_prefix_hit(spark):
    probes = spark.createDataFrame(
        [(1, "small ringg"), (2, "small qolt")], "probe_id long, probe_text string"
    )
    _, corpus = _frames(spark)
    out = blocked_fuzzy_join(
        probes, corpus, "probe_text", "match_text",
        lambda c: F.substring(c, 1, 5), max_distance=2,
    )
    got = sorted((r["probe_id"], r["match_id"], r["distance"]) for r in out.collect())
    # "small ringg" -> "small ring" (1 insert); "small qolt" -> "small bolt"
    # (1 sub); cross pairs exceed distance 2 and are filtered
    assert got == [(1, 10, 1), (2, 11, 1)]


def test_blocked_fuzzy_join_rejects_non_column_blocker(spark):
    probes, corpus = _frames(spark)
    with pytest.raises(TypeError):
        blocked_fuzzy_join(
            probes, corpus, "probe_text", "match_text", lambda c: "small", 2
        ).collect()


def test_corr_matrix_exact_known_values(spark):
    # y = 2x exactly -> corr 1; z anti-correlates with x -> corr -1
    rows = [(x, 2 * x, 10 - x) for x in range(1, 9)]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {(r["col_x"], r["col_y"]): (r["n"], r["corr"]) for r in
           corr_matrix_exact(df, ["x", "y", "z"]).collect()}
    assert got == {
        ("x", "y"): (8, 1.0),
        ("x", "z"): (8, -1.0),
        ("y", "z"): (8, -1.0),
    }


def test_corr_matrix_exact_matches_closed_form(spark):
    rows = [(1, 5), (2, 4), (3, 8), (4, 2), (5, 9), (6, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    [r] = corr_matrix_exact(df, ["a", "b"]).collect()
    n = len(rows)
    sa = sum(a for a, _ in rows); sb = sum(b for _, b in rows)
    sab = sum(a * b for a, b in rows)
    saa = sum(a * a for a, _ in rows); sbb = sum(b * b for _, b in rows)
    expect = (n * sab - sa * sb) / (
        math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    )
    assert r["corr"] == round(expect, 6)


def test_corr_matrix_exact_requires_two_columns(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        corr_matrix_exact(df, ["x"])
