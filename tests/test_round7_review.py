"""Round-7 self-review fixes, pinned.

A high-effort review pass over sources/ and streaming/ (after the
operators/ pass that produced the degenerate-vector fixes in
test_round7_fixes.py) surfaced six defects; each gets a regression test
here so the fixed behavior is load-bearing, not incidental:

1. parquet_footer_stats used the Arrow TOP-LEVEL field index as a
   parquet LEAF index (wrong stats once a nested column precedes the
   target; IndexError when a file lacks the column).
2. read_binary_files' doc_id regex was unanchored to the stem start
   ('img42.png' -> spurious 42 instead of the documented null).
3. scan_folders deduped folder STRINGS only (folder + subfolder
   registration cataloged a file twice; smart_batch then merged the
   file with itself, duplicating every row).
4. stream_upsert_to_table never collapsed duplicate keys within a
   micro-batch (a keyed MERGE table with non-unique keys).
5. near-dedup: size(split(NULL)) is NULL, so null-text docs received
   no bucket at all — every re-delivery silently survived; and keying
   short docs on xxhash64(text) would funnel all null-text docs into
   one bucket (xxhash64(NULL) = the seed constant).
6. the int64 moment family: B = n*S2 - S1^2 folded in int64 wraps at
   the keys' own documented scale (~6e24 at sf125) — now decimal(38,0)
   Spark-side / HUGEINT oracle-side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def test_footer_stats_resolve_leaf_index_past_nested_columns(spark, tmp_path):
    """A struct column BEFORE the target must not shift which leaf's
    statistics are read, and a file lacking the column gets a null
    envelope (conservatively kept by prune_files), never an IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_merger_spark.sources.stats import (
        parquet_footer_stats,
        prune_files,
    )

    nested = str(tmp_path / "nested.parquet")
    t = pa.table(
        {
            "a": [{"x": 999, "y": -999}, {"x": 998, "y": -998}],
            "b": [10, 20],
        }
    )
    pq.write_table(t, nested)
    missing = str(tmp_path / "missing.parquet")
    pq.write_table(pa.table({"a": [{"x": 1, "y": 2}]}), missing)

    stats = {
        r["file"]: r
        for r in parquet_footer_stats(spark, [nested, missing], "b").collect()
    }
    assert stats[nested]["vmin"] == 10 and stats[nested]["vmax"] == 20
    assert stats[missing]["vmin"] is None and stats[missing]["vmax"] is None
    # envelope [10,20] intersects [15,25]; the stats-less file is kept
    kept = prune_files(
        parquet_footer_stats(spark, [nested, missing], "b"), 15, 25
    )
    assert set(kept) == {nested, missing}


def test_binary_doc_id_requires_fully_numeric_stem(spark, tmp_path):
    """'img42.png' must yield null doc_id (non-numeric stem), '42.png'
    must yield 42 — a mid-stem match would join payloads to the wrong
    metadata rows."""
    from parquet_merger_spark.sources.binary import read_binary_files

    (tmp_path / "img42.png").write_bytes(b"\x89PNG")
    (tmp_path / "42.png").write_bytes(b"\x89PNG")
    got = {
        os.path.basename(r["path"]): r["doc_id"]
        for r in read_binary_files(spark, str(tmp_path)).collect()
    }
    assert got["42.png"] == 42 and got["img42.png"] is None


def test_scan_folders_dedups_physical_files_across_registrations(tmp_path):
    """Registering a folder and its subfolder must catalog each physical
    file once; a double entry would make smart_batch merge a file with
    itself and duplicate every row."""
    from parquet_merger_spark.sources.catalog import scan_folders

    sub = tmp_path / "sub"
    sub.mkdir()
    pd.DataFrame({"a": [1]}).to_parquet(str(sub / "x.parquet"))
    entries = scan_folders([str(tmp_path), str(sub)])
    assert len(entries) == 1, entries


def test_stream_upsert_collapses_intra_batch_duplicate_keys(spark, tmp_path):
    """One micro-batch carrying insert + correction for the same key must
    leave exactly one row for that key in the versioned table."""
    from parquet_merger_spark.streaming.events import upsert_batch_apply

    table = str(tmp_path / "table")
    batch = spark.createDataFrame(
        [(1, "zz-late"), (1, "aa-early"), (2, "only")], "k long, v string"
    )
    upsert_batch_apply(table, ["k"])(batch, 0)
    rows = {
        r["k"]: r["v"]
        for r in spark.read.parquet(os.path.join(table, "v" + "0" * 20)).collect()
    }
    # deterministic winner: max over the non-key struct
    assert rows == {1: "zz-late", 2: "only"}


def test_near_dedup_null_text_keyed_by_doc_id(spark, tmp_path):
    """Distinct null-text docs must BOTH survive (no content to compare),
    while a re-delivery of the same null-text doc is rejected — and
    null-text docs must reach the bucket store at all
    (size(split(NULL)) is NULL, failing both length filters)."""
    from parquet_merger_spark.streaming.events import (
        near_dedup_batch_apply,
        read_near_dedup_survivors,
    )

    table = str(tmp_path / "nd")
    apply_fn = near_dedup_batch_apply(table)
    b0 = spark.createDataFrame(
        [(1, None), (2, None), (3, "real document text here")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(1, None), (4, None)], "doc_id long, text string"
    )  # doc 1 re-delivered; doc 4 is new
    apply_fn(b0, 0)
    apply_fn(b1, 1)
    got = {r["doc_id"] for r in read_near_dedup_survivors(spark, table).collect()}
    assert got == {1, 2, 3, 4}, got  # doc 1 survives ONCE (batch 0 only)
    per_batch = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(table, "survivors", "b" + "0" * 19 + "1")).collect()
    ]
    assert per_batch == [4], per_batch  # the re-delivery of 1 was rejected


def test_skewness_moment_b_survives_int64_overflow(spark, tmp_path):
    """Values large enough that B = n*S2 - S1^2 exceeds 2^63: the key
    must return a finite skewness matching an independent numpy
    computation (pre-fix: int64 wrap -> ANSI overflow error or garbage)."""
    import math

    import numpy as np

    n = 200_000
    rng = np.random.default_rng(7)
    # $100k-ish values -> c ~ 1e7 cents -> n*s2 ~ 2e5 * 2e19 = 4e24 >> 2^63
    vals = np.round(rng.uniform(90_000, 110_000, n), 2)
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": "big",
            "value": vals,
            "props": "",
        }
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"))

    from parquet_merger_spark.queries import QUERIES

    row = QUERIES["value_skewness_by_type"](spark, sf_dir).collect()[0]
    c = np.round(vals * 100).astype(object)  # exact python ints
    s1, s2, s3 = sum(c), sum(x * x for x in c), sum(x * x * x for x in c)
    a = s3 * n * n - 3 * s1 * s2 * n + 2 * s1**3
    b = n * s2 - s1 * s1
    assert b > 2**63  # the pre-fix wrap regime
    expect = round(float(a) / (math.sqrt(float(b)) * float(b)), 6)
    assert row["n"] == n
    assert math.isfinite(row["skewness"])
    assert abs(row["skewness"] - expect) < 1e-9, (row["skewness"], expect)
