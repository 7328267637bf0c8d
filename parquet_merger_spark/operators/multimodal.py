"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested: schemas, partitioning,
UDF signatures, and batch shapes all work against genuine binary columns.
Media decode is tiered: PIL when importable (not in this container), a
PURE-PYTHON decoder for the formats stdlib can handle — 8-bit
non-interlaced PNG via ``zlib`` (:func:`_parse_png`) and RIFF/WAVE PCM
via ``struct`` (:func:`_parse_wav`) decode REAL pixels/samples — and a
clearly-marked deterministic fake for everything else so pipelines stay
total over mixed payload columns.  Swapping in a full decoder
(PIL/libsndfile/ffmpeg) changes one ``decoder=`` argument.

Scale notes: payloads stay columnar (parquet binary + Arrow transfer);
``mapInPandas`` streams record batches so a partition never fully
materializes; metadata extraction is shuffle-free.  Batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fan_out (guide §2.5): binary fixtures often arrive as one split, which
# would run every Arrow decode kernel below on a single task; the spread
# is a structural no-op on real many-split inputs
from parquet_merger_spark.partitioning import fan_out

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("modality", T.StringType()),
    ]
)

_MAGIC_TO_MODALITY = {
    b"\x89PNG": "image",
    b"\xff\xd8\xff": "image",
    b"RIFF": "audio",
    b"fLaC": "audio",
}


def attach_binary_payload(
    df: DataFrame, source_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Materialize a binary column from a string column (UTF-8 bytes) —
    the test stand-in for reading real media bytes; in production the
    payload arrives from parquet binary columns or
    ``spark.read.format("binaryFile")``."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8"))


def _sniff_modality(data: bytes) -> str:
    for magic, modality in _MAGIC_TO_MODALITY.items():
        if data.startswith(magic):
            return modality
    # MP4/MOV: the BRAND 'ftyp' at offset 4 — the first 4 bytes are the
    # ftyp BOX SIZE, which varies per file (the old check matched the
    # literal size 0x18, missing most real MP4s and false-positives on
    # any length-prefixed record starting 00 00 00 18)
    if len(data) >= 8 and data[4:8] == b"ftyp":
        return "video"
    return "unknown"


def extract_payload_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-payload metadata via mapInPandas: byte length, 4-byte magic hex,
    sha256, sniffed modality.  Deterministic; exercises the full
    Arrow-batched binary path (the real decode would slot into the same
    iterator)."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), *MEDIA_META_SCHEMA.fields]
    )

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "magic": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "modality": payloads.map(lambda b: _sniff_modality(bytes(b))),
                }
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(meta_batches, out_schema)


def extract_payload_meta_expr(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """JVM-expression FAST PATH for :func:`extract_payload_meta` — the
    metadata (length, magic, sha256, modality) is fully expressible with
    built-in functions, so it runs inside whole-stage codegen with no
    Python/Arrow round-trip.  Identical output to the mapInPandas version
    (oracle-checked); keep the mapInPandas path when an actual decode will
    slot into the iterator, use this one for metadata-only pipelines."""
    magic = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    # MP4 brand at offset 4 (see _sniff_modality on why not the box size)
    brand = F.lower(F.hex(F.substring(F.col(payload_col), 5, 4)))
    modality = (
        F.when(magic.startswith("89504e47"), "image")
        .when(magic.startswith("ffd8ff"), "image")
        .when(magic.startswith("52494646"), "audio")
        .when(magic.startswith("664c6143"), "audio")
        .when(brand == "66747970", "video")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
        magic.alias("magic"),
        F.lower(F.sha2(F.col(payload_col), 256)).alias("sha256"),
        modality.alias("modality"),
    )


def _fake_image_decoder(raw: bytes, thumb_side: int):
    """DETERMINISTIC FAKE image decode (this container has no PIL/opencv):
    dimensions derive from the leading payload bytes and the 'thumbnail'
    is the byte stream resampled onto the thumb grid and scaled to [0,1].
    Content-dependent and bit-stable, so the full mapInPandas decode
    pipeline (batching, schema, partitioning) is exercised end-to-end;
    swap in a real decoder via the ``decoder=`` parameter."""
    import numpy as np

    h = 1 + (raw[0] if len(raw) > 0 else 0)
    w = 1 + (raw[1] if len(raw) > 1 else 0)
    src = np.frombuffer(raw, dtype=np.uint8) if raw else np.zeros(1, dtype=np.uint8)
    thumb = np.resize(src, thumb_side * thumb_side * 3).astype(np.float32) / 255.0
    return h, w, 3, thumb


def _parse_png(raw: bytes):
    """Minimal PURE-PYTHON PNG decode — stdlib ``zlib`` only, no PIL:
    8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth).  Returns ``(h, w,
    rgb_array)`` with shape (h, w, 3) uint8, or None when the payload is
    not a PNG this parser handles (the caller then falls back).

    The per-byte unfilter loop is O(pixels) Python — fine for the
    thumbnail-sized fixtures this container decodes; production swaps in
    PIL via the same decoder slot and never reaches this path."""
    import struct
    import zlib

    import numpy as np

    if len(raw) < 8 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = None
    bit_depth = color_type = interlace = None
    idat = b""
    while pos + 8 <= len(raw):
        (ln,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            if len(data) < 13:
                return None
            w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if not w or not h or bit_depth != 8 or channels is None or interlace != 0:
        return None
    try:
        dec = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = w * channels
    if len(dec) < h * (stride + 1):
        return None

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    recon = bytearray(h * stride)
    bpp = channels
    for r in range(h):
        f = dec[r * (stride + 1)]
        if f > 4:
            return None
        row = r * (stride + 1) + 1
        ro = r * stride
        for i in range(stride):
            x = dec[row + i]
            a = recon[ro + i - bpp] if i >= bpp else 0
            b = recon[ro - stride + i] if r > 0 else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x + a
            elif f == 2:
                v = x + b
            elif f == 3:
                v = x + (a + b) // 2
            else:
                c = recon[ro - stride + i - bpp] if (r > 0 and i >= bpp) else 0
                v = x + paeth(a, b, c)
            recon[ro + i] = v & 0xFF
    arr = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        rgb = np.repeat(arr, 3, axis=2)
    elif channels == 2:  # grey + alpha: luminance only
        rgb = np.repeat(arr[:, :, :1], 3, axis=2)
    elif channels == 4:
        rgb = arr[:, :, :3]
    else:
        rgb = arr
    return h, w, rgb


def _pure_png_decoder(thumb_side: int):
    """Decoder slot implementation for PIL-free environments: REAL pixels
    for 8-bit non-interlaced PNGs via :func:`_parse_png` (nearest-neighbor
    thumbnail), the deterministic fake for everything else — so the
    pipeline stays total over mixed payload columns."""
    import numpy as np

    def decode(raw: bytes, _side=thumb_side):
        parsed = _parse_png(raw)
        if parsed is None:
            return _fake_image_decoder(raw, _side)
        h, w, rgb = parsed
        ys = (np.arange(_side) * h) // _side
        xs = (np.arange(_side) * w) // _side
        thumb = (
            rgb[np.ix_(ys, xs)].astype(np.float32).reshape(-1) / 255.0
        )
        return h, w, 3, thumb

    return decode


def _parse_wav(raw: bytes):
    """Minimal PURE-PYTHON RIFF/WAVE parser: PCM (format 1), 8- or 16-bit,
    any channel count (downmixed by mean).  Returns ``(sample_rate,
    n_samples, float32_wave)`` in [-1, 1], or None when not such a WAV."""
    import struct

    import numpy as np

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (sz,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        chunk = raw[pos + 8 : pos + 8 + sz]
        if cid == b"fmt " and fmt is None:
            fmt = chunk
        elif cid == b"data" and data is None:
            data = chunk
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or n_ch < 1 or bits not in (8, 16):
        return None
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
        samples = (samples - 128.0) / 128.0
    else:
        n = len(data) // 2 * 2
        samples = np.frombuffer(data[:n], dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        n = len(samples) // n_ch * n_ch
        samples = samples[:n].reshape(-1, n_ch).mean(axis=1)
    return int(rate), int(len(samples)), samples.astype(np.float32)


def _try_pil_decoder(thumb_side: int):
    """Real decoder when PIL is importable (import-try gate; None here)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    import io

    import numpy as np

    def decode(raw: bytes, _side=thumb_side):
        from PIL import Image

        img = Image.open(io.BytesIO(raw)).convert("RGB")
        h, w = img.height, img.width
        small = img.resize((_side, _side))
        thumb = np.asarray(small, dtype=np.float32).reshape(-1) / 255.0
        return h, w, 3, thumb

    return decode


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
    thumb_side: int = 4,
) -> DataFrame:
    """Decode image payloads to (id, height, width, channels, thumb) —
    thumb is the flattened ``thumb_side^2 x 3`` float32 thumbnail in
    [0,1], the standard input for embedding/featurization stages.

    The decode slot is Arrow-batched ``mapInPandas`` — the production
    shape for media work: bounded per-batch memory, arbitrary input
    partitioning, Python libs isolated to the worker.  ``decoder(raw,
    thumb_side) -> (h, w, c, flat_float32)`` is pluggable; the default is
    PIL when importable, else the PURE-PYTHON PNG parser
    (:func:`_parse_png` — real pixels for 8-bit non-interlaced PNGs,
    stdlib zlib only), with the clearly-marked deterministic fake
    (:func:`_fake_image_decoder`) covering payloads neither can decode,
    so pipelines stay runnable and testable in media-lib-free
    environments (like this container)."""
    import pandas as pd

    dec = decoder or _try_pil_decoder(thumb_side) or _pure_png_decoder(thumb_side)
    out_schema = (
        f"{id_col} long, height int, width int, channels int, thumb array<float>"
    )

    def decode_batches(batches):
        for pdf in batches:
            hs, ws, cs, ts = [], [], [], []
            for raw in pdf[payload_col]:
                h, w, c, t = dec(bytes(raw), thumb_side)
                hs.append(h)
                ws.append(w)
                cs.append(c)
                ts.append(list(t))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "height": hs,
                    "width": ws,
                    "channels": cs,
                    "thumb": ts,
                }
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(decode_batches, out_schema)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder=None,
    max_samples: int = 64,
) -> DataFrame:
    """Decode audio payloads to (id, sample_rate, n_samples, waveform) —
    waveform is the first ``max_samples`` samples scaled to [-1, 1].
    Same pluggable-decoder / mapInPandas shape as :func:`decode_image`;
    the default decodes REAL RIFF/WAVE PCM payloads via the pure-Python
    parser (:func:`_parse_wav`, stdlib struct only) and falls back to the
    deterministic fake (payload bytes as 8-bit PCM, sample_rate 16000)
    for anything else, so the plumbing runs end-to-end without
    libsndfile/ffmpeg."""
    import numpy as np
    import pandas as pd

    def fake(raw: bytes, _n=max_samples):
        src = np.frombuffer(raw[:_n], dtype=np.uint8).astype(np.float32)
        wave = (src - 128.0) / 128.0
        return 16_000, len(raw), wave

    def default(raw: bytes, _n=max_samples):
        parsed = _parse_wav(raw)
        if parsed is None:
            return fake(raw)
        sr, n, wave = parsed
        return sr, n, wave[:_n]

    dec = decoder or default
    out_schema = (
        f"{id_col} long, sample_rate int, n_samples long, waveform array<float>"
    )

    def decode_batches(batches):
        for pdf in batches:
            srs, ns, ws = [], [], []
            for raw in pdf[payload_col]:
                sr, n, w = dec(bytes(raw))
                srs.append(sr)
                ns.append(n)
                ws.append(list(w))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": srs,
                    "n_samples": ns,
                    "waveform": ws,
                }
            )

    return fan_out(df.select(id_col, payload_col)).mapInPandas(decode_batches, out_schema)


def payload_byte_histogram(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Feature extraction over binary payloads: a 256-bin byte histogram
    per payload, L1-normalized — a REAL media-free feature vector (byte
    distributions separate text/image/audio codecs surprisingly well) and
    the stand-in for an embedding model in this container.  Output
    (id, features: array<double>) plugs directly into
    :mod:`operators.simsearch` (cosine top-k / near-dup over payloads).

    mapInPandas + numpy bincount: Arrow-batched, shuffle-free, one pass.
    The real learned-feature extractor drops into the same iterator.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                h = np.bincount(arr, minlength=256).astype(np.float64)
                total = h.sum()
                feats.append((h / total if total else h).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return fan_out(df.select(id_col, payload_col)).mapInPandas(hist_batches, out_schema)


def frame_sample_plan(
    df: DataFrame,
    every_n: int,
    n_frames_col: str = "n_frames",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling *plan*: explode (id, frame_idx) for every
    ``every_n``-th frame — pure JVM sequence/explode, no decode.  The
    decode of selected frames would join this plan against the payloads
    and run in mapInPandas."""
    # explode_outer: plain explode makes InferFiltersFromGenerate build the
    # frame sequence a second time inside a pushed-down filter.  The
    # sequence is NULL (not clamped to [0, 0]) for n_frames <= 0 or NULL:
    # greatest(n_frames-1, 0) would emit a PHANTOM frame 0 for an
    # empty/corrupt clip, and a downstream decode would then request a
    # frame that does not exist.  explode_outer turns the NULL sequence
    # into one NULL frame_idx row, dropped by the post-generate filter
    # (a filter on the GENERATED column — InferFiltersFromGenerate only
    # rebuilds generators for filters on generator INPUTS).
    seq = F.when(
        F.col(n_frames_col) >= 1,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
    )
    return (
        df.select(F.col(id_col), F.explode_outer(seq).alias("frame_idx"))
        .filter(F.col("frame_idx").isNotNull())
    )


def encode_png_rgb(pixels) -> bytes:
    """Minimal PURE-PYTHON PNG encoder (stdlib zlib): 8-bit RGB,
    non-interlaced, filter-0 scanlines — the writing twin of
    :func:`_parse_png`, so a media pipeline in this PIL-free container can
    round-trip real pixels end-to-end (and tests/queries can synthesize
    genuine PNG payloads deterministically).  ``pixels``: numpy (h, w, 3)
    uint8."""
    import struct
    import zlib

    h, w = pixels.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = ctype + data
        return (
            struct.pack(">I", len(data))
            + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    stream = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )


def encode_wav_pcm16(samples, sample_rate: int = 16_000) -> bytes:
    """Minimal PURE-PYTHON WAV encoder (stdlib struct): mono 16-bit PCM —
    the writing twin of :func:`_parse_wav`, completing the PIL/libsndfile-
    free round trip for audio the way :func:`encode_png_rgb` does for
    images.  ``samples``: numpy float array in [-1, 1].

    Quantization is ROUND-to-nearest on the symmetric /32768 grid —
    the exact inverse of :func:`_parse_wav`'s ``/32768`` decode, so any
    sample on a k/32768 grid point in [-1, 1) round-trips BIT-EXACTLY
    (+1.0 itself saturates to 32767/32768 — int16 has no +32768); truncation with an asymmetric 32767 scale
    would bias every sample up to 2 LSB low."""
    import struct

    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = (
        np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype("<i2").tobytes()
    )
    n_ch, bits = 1, 16
    byte_rate = sample_rate * n_ch * bits // 8
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
