"""binaryFile source (sources/binary.py): raw media files -> DataFrame
rows, composed with the multimodal metadata extractor, plus the
pack-to-parquet shard round trip.
"""

from __future__ import annotations

import os

from parquet_merger_spark.sources.binary import read_binary_files

PNG_MAGIC = bytes.fromhex("89504e470d0a1a0a")
JPEG_MAGIC = bytes.fromhex("ffd8ffe0")


def _media_dir(tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "101.png").write_bytes(PNG_MAGIC + b"fake-png-body")
    (d / "102.jpg").write_bytes(JPEG_MAGIC + b"fake-jpeg-body")
    (d / "notes.txt").write_bytes(b"not media")
    return str(d)


def test_read_binary_files_rows_and_ids(spark, tmp_path):
    d = _media_dir(tmp_path)
    got = {
        r["doc_id"]: (r["n_bytes"], bytes(r["payload"])[:4])
        for r in read_binary_files(spark, d).collect()
        if r["doc_id"] is not None
    }
    assert got[101] == (8 + 13, PNG_MAGIC[:4])
    assert got[102] == (4 + 14, JPEG_MAGIC[:4])
    # non-numeric stem -> null id, still present
    all_rows = read_binary_files(spark, d).collect()
    assert len(all_rows) == 3


def test_glob_filter_restricts_files(spark, tmp_path):
    d = _media_dir(tmp_path)
    rows = read_binary_files(spark, d, glob="*.png").collect()
    assert [r["doc_id"] for r in rows] == [101]


def test_binary_source_feeds_multimodal_metadata(spark, tmp_path):
    """The ingestion composes with extract_payload_meta_expr: modality
    detection runs on real file bytes."""
    from parquet_merger_spark.operators.multimodal import extract_payload_meta_expr

    d = _media_dir(tmp_path)
    df = read_binary_files(spark, d).filter("doc_id IS NOT NULL")
    meta = extract_payload_meta_expr(df, id_col="doc_id", payload_col="payload")
    got = {r["doc_id"]: r["modality"] for r in meta.collect()}
    assert got == {101: "image", 102: "image"}


def test_pack_to_parquet_shard_roundtrip(spark, tmp_path):
    """Writing the binary frame as parquet = packing small media files
    into columnar shards; payloads must survive byte-exact."""
    d = _media_dir(tmp_path)
    out = str(tmp_path / "shards")
    read_binary_files(spark, d).write.mode("overwrite").parquet(out)
    back = {
        r["doc_id"]: bytes(r["payload"])
        for r in spark.read.parquet(out).filter("doc_id IS NOT NULL").collect()
    }
    assert back[101] == PNG_MAGIC + b"fake-png-body"
    assert back[102] == JPEG_MAGIC + b"fake-jpeg-body"


def test_upsert_table_time_travel(spark, tmp_path):
    """Version directories stay readable: as-of reads reconstruct any
    past state of the streaming MERGE table."""
    import time

    import pandas as pd

    from parquet_merger_spark.streaming.events import (
        read_upsert_table,
        stream_upsert_to_table,
        upsert_table_versions,
    )

    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    now = time.time()
    for i, pdf in enumerate(
        [
            pd.DataFrame({"k": [1], "v": ["a1"]}),
            pd.DataFrame({"k": [1, 2], "v": ["a2", "b2"]}),
        ]
    ):
        p = os.path.join(src, f"b{i}.parquet")
        pdf.to_parquet(p)
        os.utime(p, (now + i, now + i))

    table = os.path.join(str(tmp_path), "table")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = stream_upsert_to_table(spark, src, table, ckpt, ["k"])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert upsert_table_versions(table) == [0, 1]
    v0 = {r["k"]: r["v"] for r in read_upsert_table(spark, table, 0).collect()}
    cur = {r["k"]: r["v"] for r in read_upsert_table(spark, table).collect()}
    assert v0 == {1: "a1"}
    assert cur == {1: "a2", 2: "b2"}
