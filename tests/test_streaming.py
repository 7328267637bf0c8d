"""Structured Streaming smoke tests: file source -> watermarked windowed
aggregate -> memory sink, compared EXACTLY against the batch twin.

Technique: the event files are fed one per micro-batch (controlled mtimes),
and a final sentinel file carries a single far-future event that pushes the
watermark beyond every real window.  In ``append`` mode each real window is
then emitted exactly once when it finalizes — so (memory sink) minus (the
never-finalized sentinel window) must equal the batch twin row-for-row,
which also proves watermark-driven state eviction actually fires (in
``complete`` mode this comparison would see duplicate window versions).
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.streaming.events import (  # noqa: E402
    session_window_agg,
    session_window_stream,
    sessionize_batch,
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

SENTINEL_TS = pd.Timestamp("2030-01-01 00:00:00")


def _make_event_files(root) -> tuple[str, pd.DataFrame]:
    """3 real files (ts-ordered) + 1 far-future sentinel; mtimes force the
    file source to process them in that order."""
    rng_rows = []
    base = pd.Timestamp("2024-03-01 00:00:00")
    eid = 0
    for hour in range(6):
        for minute in (1, 7, 31, 55):
            for user in (1, 2, 3):
                eid += 1
                rng_rows.append(
                    {
                        "event_id": eid,
                        "ts": base + pd.Timedelta(hours=hour, minutes=minute, seconds=user),
                        "user_id": user,
                        "event_type": "click" if eid % 2 else "view",
                        "value": float(eid % 10),
                    }
                )
    real = pd.DataFrame(rng_rows).sort_values("ts").reset_index(drop=True)
    # tz-aware -> Spark TIMESTAMP (watermarks reject TIMESTAMP_NTZ)
    real["ts"] = real["ts"].dt.tz_localize("UTC")

    events_dir = os.path.join(str(root), "events_stream")
    os.makedirs(events_dir, exist_ok=True)
    thirds = [real.iloc[:24], real.iloc[24:48], real.iloc[48:]]
    sentinel = pd.DataFrame(
        [
            {
                "event_id": 999_999,
                "ts": SENTINEL_TS.tz_localize("UTC"),
                "user_id": 99,
                "event_type": "sentinel",
                "value": 0.0,
            }
        ]
    )
    for i, chunk in enumerate([*thirds, sentinel]):
        p = os.path.join(events_dir, f"part_{i}.parquet")
        # micro-second timestamps: Spark 4 rejects TIMESTAMP(NANOS) parquet
        chunk.to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        # file source orders by modification time: force chunk order
        mtime = time.time() - 400 + i * 100
        os.utime(p, (mtime, mtime))
    return events_dir, real


@pytest.fixture(scope="module")
def event_files(tmp_path_factory):
    return _make_event_files(tmp_path_factory.mktemp("stream"))


def _canon(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_windowed_stream_matches_batch_twin(spark, event_files, tmp_path):
    events_dir, real = event_files
    q = windowed_event_counts_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_win"),
        window="1 hour",
        watermark="2 hours",
        query_name="win_smoke",
        output_mode="append",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.table("win_smoke").filter("event_type <> 'sentinel'")
    expected = windowed_event_counts_batch(
        spark.createDataFrame(real), window="1 hour"
    )
    assert _canon(got) == _canon(expected)
    # the sentinel's own window never finalizes -> append must NOT emit it
    assert spark.table("win_smoke").filter("event_type = 'sentinel'").count() == 0


def test_session_window_stream_matches_batch_twin(spark, event_files, tmp_path):
    events_dir, real = event_files
    q = session_window_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_sess"),
        gap_minutes=30,
        watermark="2 hours",
        query_name="sess_smoke",
        output_mode="append",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.table("sess_smoke").filter("user_id <> 99")
    expected = session_window_agg(spark.createDataFrame(real), gap_minutes=30)
    assert _canon(got) == _canon(expected)


def test_session_window_agg_agrees_with_lag_idiom(spark, event_files):
    """The native session_window aggregate and the lag+cumsum idiom must
    find the same sessions on gap-free-of-boundary data (no event lands at
    exactly the 30-minute gap, so the half-open-vs-closed boundary
    difference documented on session_window_agg cannot bite)."""
    _, real = event_files
    df = spark.createDataFrame(real)
    native = session_window_agg(df, gap_minutes=30).select(
        "user_id", "session_start", "n_events"
    )
    lag_based = sessionize_batch(df, gap_minutes=30).select(
        "user_id", "session_start", "n_events"
    )
    assert _canon(native) == _canon(lag_based)


def test_streaming_distinct_drops_redeliveries(spark, tmp_path):
    """dropDuplicatesWithinWatermark: re-delivered events (at-least-once
    source semantics) are emitted exactly once."""
    from parquet_merger_spark.streaming.events import streaming_distinct_events

    events_dir = str(tmp_path / "dup_events")
    os.makedirs(events_dir, exist_ok=True)
    base = pd.Timestamp("2024-03-01 00:00:00", tz="UTC")
    f1 = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(100)],
            "user_id": [i % 5 for i in range(100)],
        }
    )
    # second file re-delivers the last 50 events and adds 50 new ones
    f2 = pd.DataFrame(
        {
            "event_id": list(range(50, 150)),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(50, 150)],
            "user_id": [i % 5 for i in range(50, 150)],
        }
    )
    for i, chunk in enumerate([f1, f2]):
        p = os.path.join(events_dir, f"f{i}.parquet")
        chunk.to_parquet(p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        mtime = time.time() - 100 + i * 50
        os.utime(p, (mtime, mtime))

    q = streaming_distinct_events(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_dd"),
        watermark="3 hours",
        query_name="dd_smoke",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.table("dd_smoke")
    assert got.count() == 150  # 200 delivered, 50 were re-deliveries
    assert got.select("event_id").distinct().count() == 150


def test_custom_stateful_running_totals(spark, event_files, tmp_path):
    """applyInPandasWithState: per-user lifetime totals accumulate across
    micro-batches; the final emission per user equals the batch aggregate."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.streaming.events import user_running_totals_stream

    events_dir, real = event_files
    q = user_running_totals_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_totals"),
        query_name="totals_smoke",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode emits one row per (user, micro-batch); n_events is
    # monotone, so the max-n_events row per user is the final state
    emitted = spark.table("totals_smoke").filter("user_id <> 99").toPandas()
    final = (
        emitted.sort_values(["user_id", "n_events"]).groupby("user_id").tail(1)
    )

    expected = {
        (r.user_id, r.n_events): r.total_value
        for r in spark.createDataFrame(real)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    got = {
        (int(r.user_id), int(r.n_events)): r.total_value
        for r in final.itertuples()
    }
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6


def test_stream_to_parquet_exactly_once(spark, event_files, tmp_path):
    """File-to-parquet streaming pipeline: every input row lands exactly
    once, and restarting from the same checkpoint adds nothing."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.streaming.events import stream_to_parquet

    events_dir, real = event_files
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt_parquet")

    def enrich(df):
        return df.withColumn("value_2x", F.col("value") * 2)

    q = stream_to_parquet(spark, events_dir, out, ckpt, transform=enrich)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == len(real) + 1  # + sentinel row
    assert "value_2x" in got.columns
    first = {(r.event_id, r.value_2x) for r in got.collect()}

    # restart from the same checkpoint: no new data -> no new rows
    q2 = stream_to_parquet(spark, events_dir, out, ckpt, transform=enrich)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    again = {(r.event_id, r.value_2x) for r in spark.read.parquet(out).collect()}
    assert again == first


def test_curation_runs_unchanged_on_a_stream(spark, tmp_path):
    """The composed curation pass is row-local end-to-end, so the SAME
    function applies to a readStream frame with no code changes — the
    'stateless transformations stream for free' property, proven by
    comparing the streamed output to the batch twin on identical files."""
    from parquet_merger_spark.operators.curation import curate_corpus

    docs_dir = str(tmp_path / "docs_stream")
    batch = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .limit(200)
        .coalesce(1)
    )
    batch.write.mode("overwrite").parquet(docs_dir)

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(docs_dir)
    q = (
        curate_corpus(stream)
        .writeStream.format("memory")
        .queryName("curate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.doc_id, r.quality, r.text_redacted)
        for r in spark.table("curate_smoke").collect()
    }
    expected = {
        (r.doc_id, r.quality, r.text_redacted)
        for r in curate_corpus(spark.read.parquet(docs_dir)).collect()
    }
    assert got == expected and len(got) > 0


def test_enrich_stream_matches_batch_twin(spark, event_files, tmp_path):
    from parquet_merger_spark.streaming.events import (
        enrich_stream,
        enrich_with_dim_batch,
    )

    events_dir, _ = event_files
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (3, "bronze")], "user_id long, tier string"
    )
    q = enrich_stream(
        spark, events_dir, dim, str(tmp_path / "ck_enrich"), query_name="t_enrich"
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM t_enrich")
    events = spark.read.parquet(events_dir)
    want = enrich_with_dim_batch(events, dim)
    assert _canon(got.select(*sorted(got.columns))) == _canon(
        want.select(*sorted(want.columns))
    )
    # the sentinel user (99) has no dim row -> null tier survives (left join)
    assert got.filter("user_id = 99").collect()[0]["tier"] is None


def test_correlate_streams_matches_batch_twin(spark, event_files, tmp_path):
    from parquet_merger_spark.streaming.events import (
        correlate_events_batch,
        correlate_streams,
    )

    events_dir, _ = event_files
    q = correlate_streams(
        spark,
        events_dir,
        str(tmp_path / "ck_corr"),
        horizon_minutes=30,
        query_name="t_corr",
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM t_corr")
    want = correlate_events_batch(spark.read.parquet(events_dir), horizon_minutes=30)
    assert _canon(got) == _canon(want)
    assert got.count() > 0  # the fixture really produces click->view pairs


def test_stream_upsert_applies_batches_in_order(spark, tmp_path):
    """foreachBatch keyed MERGE: three micro-batches carrying overlapping
    keys; the final table must equal 'last write wins per key' and the
    manifest must point at the newest version."""
    from parquet_merger_spark.streaming.events import (
        read_upsert_table,
        stream_upsert_to_table,
    )

    src = os.path.join(str(tmp_path), "upsert_src")
    os.makedirs(src)
    batches = [
        pd.DataFrame({"k": [1, 2, 3], "v": ["a1", "b1", "c1"]}),
        pd.DataFrame({"k": [2, 4], "v": ["b2", "d2"]}),
        pd.DataFrame({"k": [1, 4, 5], "v": ["a3", "d3", "e3"]}),
    ]
    now = time.time()
    for i, pdf in enumerate(batches):
        p = os.path.join(src, f"b{i}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (now + i, now + i))  # force source order

    table = os.path.join(str(tmp_path), "upsert_table")
    ckpt = os.path.join(str(tmp_path), "upsert_ckpt")
    q = stream_upsert_to_table(spark, src, table, ckpt, ["k"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["k"]: r["v"] for r in read_upsert_table(spark, table).collect()}
    assert got == {1: "a3", 2: "b2", 3: "c1", 4: "d3", 5: "e3"}
    # replay safety: versions are batch-addressed, pointer took the newest
    with open(os.path.join(table, "_CURRENT")) as fh:
        assert fh.read().strip() == "v" + "2".zfill(20)


def test_stream_near_dedup_admits_only_novel_docs(spark, tmp_path):
    """Three arrival chunks with planted near-duplicates: the streaming
    near-dedup must admit originals, reject later re-arrivals (exact and
    near-duplicate wording), and match a sequential replay of the same
    bucket rule chunk-by-chunk."""
    import itertools

    from parquet_merger_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signatures,
    )
    from parquet_merger_spark.streaming.events import (
        read_near_dedup_survivors,
        stream_near_dedup_to_table,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    alt = (
        "completely different material about distributed query engines "
        "processing parquet files with vectorized readers at scale"
    )
    third = (
        "unrelated culinary text describing how to braise vegetables "
        "slowly with garlic thyme and a splash of white wine vinegar"
    )
    chunks = [
        [(1, base), (2, alt)],
        # 11 re-states base with one word changed (near-dup); 12 novel
        [(11, base.replace("lazy", "sleepy")), (12, third)],
        # 21 exact duplicate of alt; 22 novel
        [(21, alt), (22, "a short novel sentence mentioning nothing else")],
    ]
    docs_dir = tmp_path / "nd_docs"
    docs_dir.mkdir()
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(docs_dir / f"chunk{i}"))
    # flatten: the file source watches one directory; write files in order
    import shutil, glob as _glob

    flat = tmp_path / "nd_flat"
    flat.mkdir()
    for i in range(len(chunks)):
        src = _glob.glob(str(docs_dir / f"chunk{i}" / "part-*.parquet"))[0]
        dst = str(flat / f"{i:02d}.parquet")
        shutil.copy(src, dst)
        # the file source orders micro-batches by modification time; the
        # copies land within one clock tick, so pin strictly-ascending
        # mtimes to make arrival order (= the dedup's precedence order)
        # deterministic
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    table = str(tmp_path / "nd_table")
    q = stream_near_dedup_to_table(
        spark,
        str(flat),
        table,
        checkpoint_dir=str(tmp_path / "nd_ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r.doc_id for r in read_near_dedup_survivors(spark, table).collect()}

    # sequential replay of the same rule (chunk order = file order)
    def buckets_of(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sigs = minhash_signatures(df, "doc_id", "text", 64, 2)
        out = {}
        for r in lsh_band_buckets(sigs, "doc_id", 64, 16).collect():
            out.setdefault(r.doc_id, set()).add((r.band, r.bucket))
        return out

    seen: set = set()
    expect: set = set()
    for rows in chunks:
        bks = buckets_of(rows)
        claimed_this_chunk: dict = {}
        for did, _ in rows:
            for bb in bks.get(did, set()):
                claimed_this_chunk.setdefault(bb, did)
        for did, _ in rows:
            dup = any(
                bb in seen or claimed_this_chunk[bb] < did
                for bb in bks.get(did, set())
            )
            if not dup:
                expect.add(did)
        for did, _ in rows:
            if did in expect:
                seen |= bks.get(did, set())

    assert kept == expect, (kept, expect)
    # sanity on the semantics themselves
    assert {1, 2, 12, 22} <= kept
    assert 11 not in kept and 21 not in kept


def test_stream_near_dedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: after a crash between the bucket
    write and the checkpoint commit, the SAME (batch_df, batch_id) is
    re-applied while ``_CURRENT`` already points at the crashed run's own
    bucket version.  The batch body must dedup against strictly-earlier
    versions only — a _CURRENT-based ``seen`` would flag every survivor
    of the replayed batch as a duplicate of itself and silently overwrite
    its survivor directory empty."""
    import os

    from parquet_merger_spark.streaming.events import (
        near_dedup_batch_apply,
        read_near_dedup_survivors,
    )

    table = str(tmp_path / "replay_table")
    apply_fn = near_dedup_batch_apply(table)

    b0 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the barn"),
            (2, "unrelated second document about parquet file compaction jobs"),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [
            (11, "the quick brown fox jumps over the sleepy dog near the barn"),
            (12, "entirely novel cooking text with garlic thyme and slow heat"),
        ],
        "doc_id long, text string",
    )
    apply_fn(b0, 0)
    apply_fn(b1, 1)
    first = {r.doc_id for r in read_near_dedup_survivors(spark, table).collect()}
    assert {1, 2} <= first and 12 in first  # novel docs admitted
    with open(os.path.join(table, "buckets", "_CURRENT")) as fh:
        assert fh.read().strip() == "v" + "1".zfill(20)

    # replay batch 1 — _CURRENT points at v1, the batch's own output
    apply_fn(b1, 1)
    again = {r.doc_id for r in read_near_dedup_survivors(spark, table).collect()}
    assert again == first, (again, first)


def test_read_near_dedup_survivors_before_first_batch(spark, tmp_path):
    """A table with no completed batches yet reads as an EMPTY typed
    frame (docs schema from _SCHEMA), not a FileNotFoundError."""
    import json
    import os

    from parquet_merger_spark.streaming.events import read_near_dedup_survivors

    # missing table dir entirely -> empty, schemaless
    missing = str(tmp_path / "nowhere")
    df = read_near_dedup_survivors(spark, missing)
    assert df.count() == 0

    # table dir with only the persisted schema -> empty WITH docs schema
    table = str(tmp_path / "fresh_table")
    os.makedirs(table)
    schema = spark.createDataFrame(
        [], "doc_id long, text string"
    ).schema
    with open(os.path.join(table, "_SCHEMA"), "w") as fh:
        fh.write(json.dumps(schema.jsonValue()))
    df = read_near_dedup_survivors(spark, table)
    assert df.count() == 0
    assert df.columns == ["doc_id", "text"]


def test_stream_near_dedup_short_docs_exact_tier(spark, tmp_path):
    """Documents too short to shingle get an exact-text novelty key on
    the reserved band: re-deliveries of the same short text are rejected
    (across batches and within one), distinct short texts are admitted —
    no silent dedup bypass for sub-shingle documents."""
    from parquet_merger_spark.streaming.events import (
        near_dedup_batch_apply,
        read_near_dedup_survivors,
    )

    table = str(tmp_path / "short_table")
    apply_fn = near_dedup_batch_apply(table)  # shingle_words=2 default

    b0 = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, "a much longer document with many words")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(11, "hello"), (12, "fresh"), (13, "hello"), (14, "world")],
        "doc_id long, text string",
    )
    apply_fn(b0, 0)
    apply_fn(b1, 1)
    kept = {r.doc_id for r in read_near_dedup_survivors(spark, table).collect()}
    # 11/13 re-deliver "hello" (cross-batch + within-batch), 14 re-delivers
    # "world"; 12 is a novel short text
    assert kept == {1, 2, 3, 12}, kept


def test_stream_upsert_replay_is_idempotent(spark, tmp_path):
    """Replaying a micro-batch (same batch_id) after a crash that already
    swapped _CURRENT to the batch's own version must reproduce the same
    table state — the base is the newest version strictly below batch_id,
    never _CURRENT (which would make the merge read the very path it
    overwrites)."""
    import os

    from parquet_merger_spark.streaming.events import (
        read_upsert_table,
        upsert_batch_apply,
    )

    table = str(tmp_path / "upsert_replay")
    apply_fn = upsert_batch_apply(table, ["k"])
    b0 = spark.createDataFrame([(1, "a1"), (2, "b1")], "k long, v string")
    b1 = spark.createDataFrame([(2, "b2"), (3, "c1")], "k long, v string")
    apply_fn(b0, 0)
    apply_fn(b1, 1)
    first = {r.k: r.v for r in read_upsert_table(spark, table).collect()}
    assert first == {1: "a1", 2: "b2", 3: "c1"}
    with open(os.path.join(table, "_CURRENT")) as fh:
        assert fh.read().strip() == "v" + "1".zfill(20)

    apply_fn(b1, 1)  # replay while _CURRENT points at v1
    again = {r.k: r.v for r in read_upsert_table(spark, table).collect()}
    assert again == first


def test_windowed_stream_on_rocksdb_state_store(spark, event_files, tmp_path):
    """The SAME windowed aggregation on the PRODUCTION state backend:
    RocksDB state store (what a 100 TB deployment runs — state spills to
    local disk instead of living on the executor heap).  Results must be
    identical to the default (HDFS-backed in-memory) provider; the conf
    is per-query via the session, restored afterwards."""
    events_dir, real = event_files
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = windowed_event_counts_stream(
            spark,
            events_dir,
            checkpoint_dir=str(tmp_path / "ckpt_rocks"),
            window="1 hour",
            watermark="2 hours",
            query_name="win_rocks",
            output_mode="append",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # PROOF the query ran on RocksDB, not a silent fallback: only the
    # RocksDB provider writes versioned .zip snapshots (and .changelog
    # deltas) under the checkpoint's state/ tree — the default HDFS
    # provider writes bare .delta/.snapshot files
    import glob as _glob

    rocks_files = _glob.glob(
        str(tmp_path / "ckpt_rocks" / "state" / "**" / "*.zip"),
        recursive=True,
    ) + _glob.glob(
        str(tmp_path / "ckpt_rocks" / "state" / "**" / "*.changelog"),
        recursive=True,
    )
    assert rocks_files, "no RocksDB snapshot artifacts in the state dir"
    got = spark.table("win_rocks").filter("event_type <> 'sentinel'")
    expected = windowed_event_counts_batch(
        spark.createDataFrame(real), window="1 hour"
    )
    assert _canon(got) == _canon(expected)


def test_windowed_stream_available_now_trigger(spark, event_files, tmp_path):
    """Trigger.AvailableNow — the production catch-up pattern (process
    everything present, in rate-limited micro-batches, then STOP on its
    own): the SAME helper pipeline as every other windowed test (full
    aggregate incl. sum_value), terminating without an explicit stop."""
    events_dir, real = event_files
    q = windowed_event_counts_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_avnow"),
        window="1 hour",
        watermark="2 hours",
        query_name="win_avnow",
        output_mode="append",
        available_now=True,
    )
    try:
        terminated = q.awaitTermination(120)
        assert terminated, "availableNow query did not self-terminate"
    finally:
        # on the failure path the query is still running — never leak it
        # into the session-scoped SparkSession
        q.stop()
    got = spark.table("win_avnow").filter("event_type <> 'sentinel'")
    expected = windowed_event_counts_batch(
        spark.createDataFrame(real), window="1 hour"
    )
    assert _canon(got) == _canon(expected)


def test_cms_stream_equals_batch_sketch(spark, event_files, tmp_path):
    """The streamed counter matrix (3 micro-batches through a real
    StreamingQuery, complete mode) must equal the one-shot batch sketch
    bit-for-bit — counters add, so incremental maintenance is lossless.
    Also pins the bounded-state claim: the sink never exceeds
    depth * width rows."""
    from pyspark.sql import functions as F

    from parquet_merger_spark.operators.sketches import cms_sketch
    from parquet_merger_spark.streaming.events import cms_freq_stream

    events_dir, real = event_files
    q = cms_freq_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_cms"),
        key_col="user_id",
        query_name="cms_smoke",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.i, r.slot, r.c) for r in spark.table("cms_smoke").collect()}
    full = pd.concat(
        [real, pd.DataFrame([{"event_id": 999_999, "ts": SENTINEL_TS.tz_localize("UTC"),
                              "user_id": 99, "event_type": "sentinel", "value": 0.0}])]
    )
    expected = {
        (r.i, r.slot, r.c)
        for r in cms_sketch(
            spark.createDataFrame(full).withColumn("g", F.lit(0)),
            ["g"], "user_id",
        ).collect()
    }
    assert got == expected and len(got) > 0
    assert len(got) <= 3 * 256


def test_micro_batch_latency_budget(spark):
    """Per-micro-batch processing latency stays within a generous budget.

    STREAM_LATENCY_r04 -> r05 established the steady-state envelope
    (max addBatch 1.8s across all keys at sf0.01 on a degraded host).
    A 10x regression — state blowup, a per-batch full re-scan, a lost
    watermark — must fail loudly instead of silently drifting round
    over round.  Bounds are ~3x the worst observed steady-state batch
    to ride out the +-50% host variance.
    """
    from parquet_merger_spark import queries as Q

    budgets_ms = {"stream_window_agg": 4000, "stream_near_dedup": 6000}
    first_batch_ms = 20000  # plan compile + state-store open, once
    for key, budget in budgets_ms.items():
        Q.QUERIES[key](spark, "/root/testdata/sf0.01").count()
        progress = Q.STREAM_PROGRESS.get(key, [])
        assert len(progress) >= 2, f"{key}: expected >=2 micro-batches"
        lat = [
            (p.get("duration_ms") or {}).get("addBatch")
            for p in progress
        ]
        assert all(v is not None for v in lat), f"{key}: missing addBatch in {lat}"
        assert lat[0] <= first_batch_ms, f"{key}: first batch {lat[0]}ms"
        steady = lat[1:]
        assert max(steady) <= budget, (
            f"{key}: steady-state addBatch {max(steady)}ms exceeds "
            f"{budget}ms budget ({steady})"
        )


def test_stream_latency_artifact_drift():
    """Round-over-round latency pin (r06 verdict ask #8): the committed
    STREAM_LATENCY artifacts are the diffable record of per-key
    micro-batch cost; any key whose steady-state addBatch_ms drifts
    >3x between the two latest artifacts fails here, so a state blowup
    or lost watermark can never ride in under the generous live budget
    above.  Steady state = max over batches[1:] (batch 0 pays plan
    compile + state-store open).  A +750ms absolute floor keeps
    sub-300ms keys from flaking on scheduler noise; r05->r06 worst
    observed ratio was 1.21 (stream_interval_join)."""
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(
        (
            int(m.group(1)), os.path.join(here, f)
        )
        for f in os.listdir(here)
        if (m := re.match(r"STREAM_LATENCY_r(\d+)\.json$", f))
    )
    if len(arts) < 2:
        pytest.skip("needs two committed STREAM_LATENCY artifacts")
    (_, prev_f), (_, cur_f) = arts[-2], arts[-1]
    prev, cur = json.load(open(prev_f)), json.load(open(cur_f))
    # artifact formats: pre-r08 put stream keys at TOP level; r08+ nests
    # them under "keys" beside host_canary_s / the partition curve —
    # compare the per-key maps, not the envelope (comparing envelopes
    # KeyError'd the first time two nested-format artifacts met, r10)
    prev = prev.get("keys", prev)
    cur = cur.get("keys", cur)

    def steady(d, k):
        b = d[k]["batches"]
        vals = [x["addBatch_ms"] for x in b[1:]] or [
            x["addBatch_ms"] for x in b
        ]
        # a key with zero recorded batches (aborted drain) is malformed,
        # not drifted — report it as such instead of max([]) blowing up
        return max(vals) if vals else None

    drifted = {}
    for k in sorted(set(prev) & set(cur)):
        old, new = steady(prev, k), steady(cur, k)
        if old is None or new is None:
            drifted[k] = (old, new, "empty batches in artifact")
            continue
        if new > max(3 * old, old + 750):
            drifted[k] = (old, new)
    assert not drifted, f"steady-state addBatch drift >3x: {drifted}"


def test_mincount_stream_equals_batch_sketch(spark, event_files, tmp_path):
    """The streamed register matrix equals the batch MinCount sketch
    bit-for-bit after a real multi-batch replay (min is associative and
    commutative), and state is bounded at |types| * 64 rows by
    construction."""
    from parquet_merger_spark.operators.sketches import mincount_sketch
    from parquet_merger_spark.streaming.events import mincount_distinct_stream

    events_dir, real = event_files
    q = mincount_distinct_stream(
        spark,
        events_dir,
        checkpoint_dir=str(tmp_path / "ckpt_mc"),
        group_col="event_type",
        key_col="event_id",
        query_name="mc_smoke",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.event_type, r.reg, r.m) for r in spark.table("mc_smoke").collect()}
    full = pd.concat(
        [real, pd.DataFrame([{"event_id": 999_999, "ts": SENTINEL_TS.tz_localize("UTC"),
                              "user_id": 99, "event_type": "sentinel", "value": 0.0}])]
    )
    expected = {
        (r.event_type, r.reg, r.m)
        for r in mincount_sketch(
            spark.createDataFrame(full), ["event_type"], "event_id"
        ).collect()
    }
    assert got == expected and len(got) > 0
    n_types = len({t for t, _, _ in got})
    assert len(got) <= n_types * 64


def test_state_partitions_knob_pinned_into_checkpoint(spark, event_files, tmp_path):
    """r10 (verdict #4): STREAM_LATENCY_r09 measured 4 state partitions as
    the latency floor (518ms vs 1284ms at 16); the stateful constructors
    must apply it where the FIRST checkpoint is created — the only moment
    the state partition count is choosable — and leave the caller's
    session conf untouched."""
    import json

    from parquet_merger_spark.streaming.events import (
        DEFAULT_STATE_PARTITIONS,
        windowed_event_counts_stream,
    )

    events_dir, _real = event_files
    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert before != str(DEFAULT_STATE_PARTITIONS), "fixture can't distinguish"

    ckpt = tmp_path / "ckpt_knob"
    q = windowed_event_counts_stream(
        spark, events_dir, checkpoint_dir=str(ckpt), query_name="knob_smoke"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # caller's session conf untouched (concurrent queries unaffected)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # the knob is PINNED into the checkpoint's offset log: every batch —
    # and every restart — runs the measured 4-partition state topology
    meta = json.loads((ckpt / "offsets" / "0").read_text().splitlines()[1])
    assert meta["conf"]["spark.sql.shuffle.partitions"] == str(
        DEFAULT_STATE_PARTITIONS
    )

    # opt-out inherits the session conf
    ckpt2 = tmp_path / "ckpt_knob_none"
    q = windowed_event_counts_stream(
        spark,
        events_dir,
        checkpoint_dir=str(ckpt2),
        query_name="knob_smoke2",
        state_partitions=None,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    meta2 = json.loads((ckpt2 / "offsets" / "0").read_text().splitlines()[1])
    assert meta2["conf"]["spark.sql.shuffle.partitions"] == before
