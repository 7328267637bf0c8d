"""Tests: skew-safe top-k equivalence; byte-histogram feature extraction."""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_merger_spark.operators.multimodal import (  # noqa: E402
    attach_binary_payload,
    payload_byte_histogram,
)
from parquet_merger_spark.operators.ranking import (  # noqa: E402
    topk_per_group,
    topk_per_group_salted,
)

SF_DIR = "/root/testdata/sf0.01"


def test_salted_topk_equals_plain_topk(spark):
    from parquet_merger_spark.session import pin_oracle_confs

    pin_oracle_confs(spark)  # events carries TIMESTAMP(NANOS)
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    order = [F.desc("value"), F.col("event_id")]
    plain = topk_per_group(e, ["user_id"], order, k=5)
    salted = topk_per_group_salted(
        e, ["user_id"], order, k=5, salt_col=F.xxhash64("event_id"), n_salts=8
    )
    canon = lambda df: sorted(  # noqa: E731
        (r.user_id, r.event_id, r.rank) for r in df.collect()
    )
    assert canon(plain) == canon(salted)
    assert len(canon(plain)) > 0


def test_salted_topk_handles_k_larger_than_salt_slices(spark):
    """Every (group, salt) slice keeps k rows, so even a group whose rows
    all land in one salt slice still yields its full top-k."""
    rows = [(i, 1, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, g int, v double")
    order = [F.desc("v"), F.col("id")]
    plain = topk_per_group(df, ["g"], order, k=10)
    salted = topk_per_group_salted(
        df, ["g"], order, k=10, salt_col=F.xxhash64("id"), n_salts=4
    )
    assert sorted(r.id for r in plain.collect()) == sorted(
        r.id for r in salted.collect()
    )


def test_byte_histogram_matches_numpy(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(20)
    with_payload = attach_binary_payload(d, "text")
    feats = {
        r.doc_id: r.features
        for r in payload_byte_histogram(with_payload).collect()
    }
    rows = with_payload.select("doc_id", "text").collect()
    assert len(feats) == len(rows)
    for r in rows:
        raw = r.text.encode("utf-8")
        h = np.bincount(np.frombuffer(raw, dtype=np.uint8), minlength=256)
        expected = h / h.sum()
        got = np.array(feats[r.doc_id])
        assert got.shape == (256,)
        assert np.allclose(got, expected)
        assert abs(got.sum() - 1.0) < 1e-9


def test_byte_histogram_feeds_similarity_search(spark):
    """The multimodal feature path composes with simsearch: byte-histogram
    vectors through brute-force cosine top-k."""
    from parquet_merger_spark.operators.simsearch import brute_force_topk

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(50)
    feats = payload_byte_histogram(attach_binary_payload(d, "text")).withColumnRenamed(
        "doc_id", "vec_id"
    )
    queries = feats.filter(F.col("vec_id") < 2).withColumnRenamed("vec_id", "query_id")
    top = brute_force_topk(feats, queries, k=3, vec_col="features")
    assert top.count() == 2 * 3


def test_salted_join_equals_plain_join(spark):
    from parquet_merger_spark.operators.ranking import salted_join
    from parquet_merger_spark.session import pin_oracle_confs

    pin_oracle_confs(spark)
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    # skewed dimension: one row per user
    dim = e.groupBy("user_id").agg(F.count("*").alias("user_events"))
    plain = e.join(dim, ["user_id"])
    salted = salted_join(
        e, dim, ["user_id"], salt_from=F.xxhash64("event_id"), n_salts=8
    )
    canon = lambda df: sorted(  # noqa: E731
        (r.event_id, r.user_id, r.user_events) for r in df.collect()
    )
    assert canon(plain) == canon(salted)
    assert plain.count() == e.count()


def test_decode_image_fake_pipeline_end_to_end(spark):
    """The mapInPandas decode slot runs end-to-end with the deterministic
    fake decoder: stable schema, content-dependent dims, fixed-size thumb
    in [0,1], bit-identical across runs and repartitioning."""
    from parquet_merger_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(50)
    payloads = attach_binary_payload(docs, "text")
    out = decode_image(payloads, thumb_side=4).collect()
    assert len(out) == 50
    for r in out:
        assert r.channels == 3 and r.height >= 1 and r.width >= 1
        assert len(r.thumb) == 4 * 4 * 3
        assert all(0.0 <= v <= 1.0 for v in r.thumb)
    again = decode_image(payloads.repartition(7), thumb_side=4).collect()
    assert {(r.doc_id, tuple(r.thumb)) for r in out} == {
        (r.doc_id, tuple(r.thumb)) for r in again
    }, "decode must be deterministic and partitioning-independent"


def test_decode_audio_fake_pipeline_end_to_end(spark):
    from parquet_merger_spark.operators.multimodal import (
        attach_binary_payload,
        decode_audio,
    )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(20)
    out = decode_audio(attach_binary_payload(docs, "text"), max_samples=32).collect()
    assert len(out) == 20
    for r in out:
        assert r.sample_rate == 16_000
        assert r.n_samples > 0
        assert 0 < len(r.waveform) <= 32
        assert all(-1.0 <= v <= 1.0 for v in r.waveform)


def test_decode_image_custom_decoder_plugs_in(spark):
    """The decoder parameter is the real-library slot: a custom callable
    must fully control the output."""
    from parquet_merger_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image,
    )

    def fixed(raw, thumb_side):
        return 7, 9, 1, [0.5] * (thumb_side * thumb_side * 3)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(5)
    out = decode_image(attach_binary_payload(docs, "text"), decoder=fixed).collect()
    assert all(r.height == 7 and r.width == 9 and r.channels == 1 for r in out)


def test_assign_row_ids_matches_global_window_with_ties_and_nulls(spark):
    from pyspark.sql import Window

    from parquet_merger_spark.operators.ranking import assign_row_ids

    rows = [(i, float(i % 7)) for i in range(500)] + [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = assign_row_ids(df, "v", ["id"], n_buckets=8)
    w = Window.orderBy(F.asc_nulls_first("v"), "id")
    want = df.withColumn("row_id", F.row_number().over(w).cast("long"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_assign_row_ids_plan_never_globally_sorts_the_data(spark):
    """The scale invariant: the DATA is ranked inside __bucket-hash
    partitions; no range-partitioned global sort of the input exists
    anywhere in the plan.  (SinglePartition exchanges DO appear since
    the offsets went lazy — but only over model-sized frames: the
    ≤ n_buckets count table's prefix-sum window and the 1-row boundary
    aggregate, the vouched global-scalar family.)"""
    from parquet_merger_spark.operators.ranking import assign_row_ids

    df = spark.range(10_000).withColumn("v", (F.col("id") % 97).cast("double"))
    got = assign_row_ids(df, "v", ["id"], n_buckets=16)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    assert "hashpartitioning(__bucket" in plan
    # every single-partition window sorts __bucket only (count-table
    # prefix sum), never the data's key column
    for ln in plan.splitlines():
        if "Sort" in ln and "v#" in ln:
            assert "__bucket" in ln, ln


def test_assign_row_ids_single_bucket_and_constant_key(spark):
    from parquet_merger_spark.operators.ranking import assign_row_ids

    df = spark.createDataFrame([(i, 1.0) for i in range(20)], "id long, v double")
    got = assign_row_ids(df, "v", ["id"], n_buckets=1)
    assert [r.row_id for r in got.orderBy("id").collect()] == list(range(1, 21))


def test_decode_to_ann_composition(spark):
    """The full multimodal pipeline: binary payloads -> Arrow-batched
    decode (deterministic fake) -> thumbnail vectors -> kNN graph over
    the thumb embeddings.  Proves the decode output schema plugs straight
    into the ANN operators (vec_col is just a column name) and the whole
    chain is partitioning-invariant."""
    from parquet_merger_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image,
    )
    from parquet_merger_spark.operators.simsearch import knn_graph

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(60)
    payloads = attach_binary_payload(d, "text")
    thumbs = decode_image(payloads, thumb_side=4)
    assert thumbs.columns == ["doc_id", "height", "width", "channels", "thumb"]

    g = knn_graph(thumbs, k=3, id_col="doc_id", vec_col="thumb")
    rows = g.collect()
    assert len(rows) == 60 * 3
    assert all(1 <= r.rank <= 3 and r.id != r.neighbor_id for r in rows)

    g2 = knn_graph(thumbs.repartition(11), k=3, id_col="doc_id", vec_col="thumb")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, g2.collect()))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _make_png(raw, color_type: int, filters):
    """Encode a REAL PNG from raw pixel rows (numpy (h, w, c) uint8) with a
    chosen scanline filter per row — the encoder-side transform the parser
    must invert."""
    import struct
    import zlib

    import numpy as np

    h, w, c = raw.shape
    stride = w * c
    flat = raw.reshape(h, stride).astype(np.int32)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    stream = bytearray()
    for r, f in zip(range(h), filters):
        stream.append(f)
        for i in range(stride):
            x = int(flat[r, i])
            a = int(flat[r, i - c]) if i >= c else 0
            b = int(flat[r - 1, i]) if r > 0 else 0
            cc = int(flat[r - 1, i - c]) if (r > 0 and i >= c) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - a
            elif f == 2:
                v = x - b
            elif f == 3:
                v = x - (a + b) // 2
            else:
                v = x - paeth(a, b, cc)
            stream.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )


def test_decode_image_real_png_pixels(spark):
    """A genuine PNG byte literal (built with stdlib zlib, all five
    scanline filters across rows) decodes to its TRUE dimensions and
    pixel values through the Spark pipeline — no PIL in this container,
    so this certifies the pure-Python parser; a non-PNG payload in the
    same column still takes the documented fake path."""
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        _parse_png,
        decode_image,
    )

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _make_png(raw, color_type=2, filters=[0, 1, 2, 3, 4])

    h, w, rgb = _parse_png(png)
    assert (h, w) == (5, 4)
    assert np.array_equal(rgb, raw), "filter inversion must be exact"

    rows = [(1, bytearray(png)), (2, bytearray(b"not an image at all"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_image(df, thumb_side=2).collect()}
    assert (out[1].height, out[1].width, out[1].channels) == (5, 4, 3)
    # nearest-neighbor thumb: rows {0, 2}, cols {0, 2} of the true pixels
    expect = raw[np.ix_([0, 2], [0, 2])].astype(np.float32).reshape(-1) / 255.0
    assert np.allclose(out[1].thumb, expect)
    assert (out[2].height, out[2].width) == (1 + ord("n"), 1 + ord("o"))  # fake

    # greyscale and RGBA variants decode through the same parser
    grey = rng.integers(0, 256, size=(3, 3, 1), dtype=np.uint8)
    gh, gw, grgb = _parse_png(_make_png(grey, color_type=0, filters=[0, 1, 4]))
    assert (gh, gw) == (3, 3) and np.array_equal(grgb, np.repeat(grey, 3, axis=2))
    rgba = rng.integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    ah, aw, argb = _parse_png(_make_png(rgba, color_type=6, filters=[2, 3]))
    assert (ah, aw) == (2, 2) and np.array_equal(argb, rgba[:, :, :3])


def test_decode_audio_real_wav_samples(spark):
    """A genuine RIFF/WAVE PCM payload decodes to its true sample rate,
    downmixed sample count, and [-1,1] waveform; junk bytes still take
    the documented 8-bit fake path."""
    import struct

    import numpy as np

    from parquet_merger_spark.operators.multimodal import decode_audio

    sr, samples = 8000, np.array([0, 16384, -16384, 32767, -32768, 0], dtype="<i2")
    # stereo: L = samples, R = 0 -> downmix mean = samples/2
    stereo = np.zeros(len(samples) * 2, dtype="<i2")
    stereo[0::2] = samples
    data = stereo.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    rows = [(1, bytearray(wav)), (2, bytearray(b"zz"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_audio(df, max_samples=4).collect()}
    assert out[1].sample_rate == sr
    assert out[1].n_samples == len(samples)
    expect = (samples.astype(np.float32) / 32768.0 / 2.0)[:4]
    assert np.allclose(out[1].waveform, expect)
    assert out[2].sample_rate == 16_000  # fake path


def test_encode_png_rgb_roundtrips_through_parser():
    """The engine's own encoder (filter-0, stdlib zlib) must parse back
    bit-exactly through _parse_png — the pair gives PIL-free pipelines a
    real pixel round-trip."""
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        _parse_png,
        encode_png_rgb,
    )

    arr = ((np.arange(7 * 5 * 3, dtype=np.int64) * 13) % 256).astype(
        np.uint8
    ).reshape(7, 5, 3)
    h, w, rgb = _parse_png(encode_png_rgb(arr))
    assert (h, w) == (7, 5)
    assert (rgb == arr).all()


def test_encode_wav_pcm16_roundtrips_through_parser():
    import numpy as np

    from parquet_merger_spark.operators.multimodal import (
        _parse_wav,
        encode_wav_pcm16,
    )

    wave = (((np.arange(120, dtype=np.int64) * 7) % 128) - 64) / 64.0
    sr, n, parsed = _parse_wav(encode_wav_pcm16(wave, 22_050))
    assert (sr, n) == (22_050, 120)
    # k/64 grid points in [-1, 1) sit exactly on the k/32768 encode
    # grid: the round-to-nearest symmetric quantizer round-trips them
    # BIT-EXACTLY (+1.0 would saturate to 32767/32768)
    assert np.abs(parsed.astype(np.float64) - wave).max() == 0.0
