"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Design for a 100 TB media corpus: the media payload is an opaque
``binary`` column (or a pointer column to object storage for >~10 MB
blobs), typed metadata travels alongside in ordinary columns, and all
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — one
Python worker pass, no row-at-a-time serde, schema declared up front so
Catalyst can prune.

The image/audio codec libraries are NOT in this container, so PIXEL
decode is stubbed (``decode_image(pixels=True)`` raises
NotImplementedError).  Container-header METADATA, however, is pure
public-knowledge byte parsing — :func:`sniff_image_dims` reads real
(format, width, height) off PNG IHDR / GIF logical-screen / JPEG SOFn /
BMP info headers with no codec, and ``extract_blob_features`` uses it
whenever the payload's magic matches (the synthetic text corpus never
matches, so the oracle's ``fake_decode_dims`` math is untouched).
Everything Spark-side — schema, batching, UDF signature, partition
behavior — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# SOFn markers carrying frame dimensions (ITU T.81 §B.2.2): C0-CF minus
# C4 (DHT), C8 (JPG extension), CC (DAC).
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(data: bytes) -> tuple[str, int, int] | None:
    """Walk JPEG segments to the first SOFn and read (height, width)
    off its frame header — length-prefixed hops, no entropy decode."""
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1  # filler bytes between segments: resync
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers (SOI/TEM/RSTn) have no length
            continue
        if marker in (0xD9, 0xDA):
            return None  # EOI / start-of-scan: dims must precede SOS
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if seglen < 2:
            return None  # corrupt length field
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > n:
                return None  # SOF frame header truncated
            h = int.from_bytes(data[pos + 5 : pos + 7], "big")
            w = int.from_bytes(data[pos + 7 : pos + 9], "big")
            return ("jpeg", w, h)
        pos += 2 + seglen
    return None


def sniff_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from container header bytes alone — PNG
    IHDR (big-endian u32 pair after the 8-byte magic + chunk header),
    GIF87a/89a logical screen descriptor (little-endian u16 pair), BMP
    BITMAPINFOHEADER (signed LE i32 pair; negative height = top-down
    row order) or BITMAPCOREHEADER (LE u16 pair), and JPEG SOFn frame
    headers (segment walk).  None when no container magic matches —
    callers fall back to their stand-in.  No codec library involved:
    this is real metadata on real corpora."""
    if payload[:8] == PNG_MAGIC and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if payload[:2] == b"BM" and len(payload) >= 22:
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40 and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))
        if hdr_size == 12:  # OS/2 BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return ("bmp", w, h)
        return None
    if payload[:2] == b"\xff\xd8":
        return _jpeg_dims(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return _webp_dims(payload)
    return None


def _webp_dims(data: bytes) -> tuple[str, int, int] | None:
    """WebP dimensions off the first chunk after the RIFF/WEBP header:
    VP8 (lossy: 14-bit w/h at frame-header offset 6 after the 3-byte
    frame tag + 3-byte sync code), VP8L (lossless: 14-bit fields packed
    LSB-first after the 0x2F signature), VP8X (extended: 24-bit LE
    canvas minus one)."""
    tag = data[12:16]
    if tag == b"VP8 " and len(data) >= 30 and data[23:26] == b"\x9d\x01\x2a":
        w = int.from_bytes(data[26:28], "little") & 0x3FFF
        h = int.from_bytes(data[28:30], "little") & 0x3FFF
        return ("webp", w, h)
    if tag == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return ("webp", w, h)
    if tag == b"VP8X" and len(data) >= 30:
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return ("webp", w, h)
    return None

BLOB_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("fake_width", T.LongType(), True),
        T.StructField("fake_height", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_sampled", T.LongType(), True),
        T.StructField("sampled_len_sum", T.LongType(), True),
        T.StructField("resized_n_bytes", T.LongType(), True),
    ]
)

# "video" frame model: the payload is a sequence of FRAME_SIZE-byte frames;
# frame-sampling keeps every FRAME_STRIDE-th frame.  "image" resize model:
# a resized payload is capped at RESIZE_W×RESIZE_H bytes.  Deterministic
# stand-ins (real decoders slot into the same mapInPandas signatures).
FRAME_SIZE = 256
FRAME_STRIDE = 4
RESIZE_W, RESIZE_H = 64, 48

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def decode_image(payload: bytes, *, pixels: bool = False) -> dict:
    """Image decode entry point.  The METADATA tier (default) is fully
    implemented — real (format, width, height) via
    :func:`sniff_image_dims`, no codec library.  Only the PIXEL tier
    (``pixels=True``) requires a codec (PIL/libvips) absent from this
    container and raises NotImplementedError."""
    info = sniff_image_dims(payload)
    if info is None:
        raise ValueError("unrecognized image container (no PNG/GIF/BMP/JPEG magic)")
    if pixels:
        raise NotImplementedError(
            "pixel decode requires a codec library not present in this "
            "container; header metadata is available without one "
            "(sniff_image_dims / decode_image(pixels=False))"
        )
    fmt, w, h = info
    return {"format": fmt, "width": w, "height": h}


def fake_decode_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decode: dimensions derived from payload
    size only (so a SQL oracle can reproduce them)."""
    return (n_bytes % 640) + 1, ((n_bytes * 7) % 480) + 1


def attach_blobs(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Materialize a binary payload column (UTF-8 bytes of the text — the
    testdata has no real media; the column type and downstream plumbing
    are what's exercised)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_blob_features(blobs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` iterator form: one pandas batch in, one out — the
    shape a real decoder (resize / frame-sample / spectrogram) plugs
    into.  Output schema is declared, enabling column pruning upstream.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            # real container metadata when the payload IS an image
            # (sniff_image_dims); the deterministic size-keyed stand-in
            # otherwise (the synthetic text corpus always falls back, so
            # the SQL oracle's octet_length math holds)
            sniffed = pdf["payload"].map(sniff_image_dims)
            dims = pd.Series(
                [
                    (s[1], s[2]) if s is not None else fake_decode_dims(n)
                    for s, n in zip(sniffed, n_bytes)
                ],
                index=pdf.index,
            )
            # REAL byte slicing per payload (the work a frame-sampler /
            # resizer does), summarized so a SQL oracle checks the math
            frames = pdf["payload"].map(
                lambda p: [p[i : i + FRAME_SIZE] for i in range(0, len(p), FRAME_SIZE)]
            )
            sampled = frames.map(lambda fs: fs[::FRAME_STRIDE])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int64"),
                    "n_frames": frames.map(len).astype("int64"),
                    "n_sampled": sampled.map(len).astype("int64"),
                    "sampled_len_sum": sampled.map(
                        lambda fs: sum(len(f) for f in fs)
                    ).astype("int64"),
                    "resized_n_bytes": pdf["payload"]
                    .map(lambda p: len(resize_stub_bytes(p)))
                    .astype("int64"),
                }
            )

    return blobs.select(id_col, "payload").mapInPandas(_extract, BLOB_FEATURES_SCHEMA)


def resize_stub_bytes(payload: bytes) -> bytes:
    """Deterministic 'resize': cap the payload at RESIZE_W×RESIZE_H bytes
    (a real implementation decodes + PIL-resizes; same signature)."""
    return payload[: RESIZE_W * RESIZE_H]


def sample_frames(
    blobs: DataFrame,
    *,
    id_col: str = "doc_id",
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Variable-rows-out frame sampling: each input payload yields one row
    per kept frame (every ``stride``-th ``frame_size``-byte chunk) — the
    mapInPandas shape a real video decoder plugs into (N rows in, ΣM rows
    out, declared schema)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            chunks: list[bytes] = []
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                for j in range(0, len(payload), frame_size * stride):
                    ids.append(did)
                    idxs.append(j // frame_size)
                    chunks.append(payload[j : j + frame_size])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": chunks})

    return blobs.select(id_col, "payload").mapInPandas(_frames, FRAMES_SCHEMA)


def audio_window_means(
    blobs: DataFrame,
    *,
    id_col: str = "doc_id",
    window: int = 1024,
) -> DataFrame:
    """Deterministic 'spectrogram' stand-in: mean byte value per
    ``window``-byte chunk as array<double> (a real implementation decodes
    PCM and emits mel bins; same Arrow-batched signature + schema)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("window_means", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def _means(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means = pdf["payload"].map(
                lambda p: [
                    sum(p[i : i + window]) / len(p[i : i + window])
                    for i in range(0, len(p), window)
                ]
            )
            yield pd.DataFrame({"doc_id": pdf[id_col], "window_means": means})

    return blobs.select(id_col, "payload").mapInPandas(_means, schema)
