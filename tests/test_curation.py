"""Composed curation pass: per-gate behavior + shuffle-freedom.

The composition with real data is oracle-checked differentially
(tests/test_oracle.py::test_oracle_match[curate_corpus]); here each gate
is exercised with a crafted doc that fails exactly that gate, and the
physical plan is pinned shuffle-free (the 100 TB claim: one narrow
stage, embarrassingly parallel)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.curation import curate_corpus  # noqa: E402

# A doc that passes every gate: >=20 tokens, English markers, low
# repetition, normal punctuation.
GOOD = (
    "the quick brown fox jumps over a lazy dog and the crew of is "
    "to in ship sails far beyond every map known to sailors here today"
)


def _curate(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return curate_corpus(df)


def test_good_doc_survives_and_is_redacted(spark):
    out = _curate(
        spark, [(1, GOOD + " contact bob@example.com or 10.0.0.1 now please")]
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.predicted_lang == "en"
    assert "<EMAIL>" in row.text_redacted and "<IP>" in row.text_redacted
    assert "bob@example.com" not in row.text_redacted


def test_each_gate_drops_its_target(spark):
    rows = [
        (1, GOOD),  # survives
        (2, "the a of is to in and short"),  # < 20 tokens
        (3, "le chat et la lune est un reve " + "mot" + " sol lune mer ciel roi bleu vert rouge noir blanc gris or"),  # French
        (4, " ".join(["spam"] * 18) + " the a of is to in and extra words here"),  # dup_token_frac
    ]
    kept = {r.doc_id for r in _curate(spark, rows).collect()}
    assert 1 in kept
    assert 2 not in kept, "min_tokens gate"
    assert 3 not in kept, "language gate"
    assert 4 not in kept, "repetition gate"


def test_curation_plan_is_shuffle_free(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate_corpus(df)
    jmode = out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = out._jdf.queryExecution().explainString(jmode)
    # r10: the operator fan_outs a low-parallelism input (guide §2.5 —
    # a single-row-group corpus otherwise runs the whole pass on ONE
    # task), so exactly one ROUND-ROBIN input-spread Exchange is
    # allowed.  The property this test guards is unchanged: the signals
    # themselves are row-local — no hash/range partitioning anywhere
    # (nothing shuffles BY a key, so the pass still scales as a narrow
    # map over arbitrary partitioning).
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan, (
        "curation signals must stay row-local (no keyed shuffle)"
    )
    assert plan.count("Exchange") <= 1, (
        "at most the one fan_out input spread"
    )


def test_curation_filter_not_inlined_into_scan(spark):
    """Canary for the Catalyst predicate-pushdown blowup: the gate filter
    must stop at the ArrowEvalPython boundary (repetition counts), not be
    textually inlined into a scan-level predicate.  When the repetition
    signals were pure expression trees, pushdown expanded the composed
    filter combinatorially (~23KB predicate, 100x slower at sf0.1)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curate_corpus(df)
    jmode = out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = out._jdf.queryExecution().explainString(jmode)
    assert "ArrowEvalPython" in plan, "repetition counts must be a UDF barrier"
    assert len(plan) < 20_000, (
        f"physical plan ballooned to {len(plan)} chars - expression inlining is back"
    )
