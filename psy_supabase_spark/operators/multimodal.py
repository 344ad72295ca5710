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


# MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3): bitrate in
# kbps by [version-group][layer][index], sample rate in Hz by [version].
_MP3_BITRATE_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_MP3_BITRATE_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_SAMPLE_RATES = {
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}


def _wav_meta(data: bytes) -> dict | None:
    """RIFF/WAVE fmt-chunk walk: (channels, sample_rate, bits) plus a
    duration estimate off the data chunk's byte length."""
    meta: dict = {"kind": "audio", "format": "wav"}
    pos, n = 12, len(data)
    byte_rate = data_size = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        csize = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            meta["channels"] = int.from_bytes(body[2:4], "little")
            meta["sample_rate"] = int.from_bytes(body[4:8], "little")
            byte_rate = int.from_bytes(body[8:12], "little")
            meta["bits"] = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if "sample_rate" not in meta:
        return None
    if byte_rate and data_size is not None:
        meta["duration_sec"] = round(data_size / byte_rate, 3)
    return meta


def _mp3_meta(data: bytes) -> dict | None:
    """MPEG audio frame header (4 bytes after the 11-bit sync): version,
    layer, bitrate, sample rate, channel mode.  An ID3v2 tag prefix is
    skipped via its syncsafe length."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    if pos + 4 > len(data):
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    if data[pos] != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3   # 0=MPEG2.5, 2=MPEG2, 3=MPEG1 (1 reserved)
    layer_code = (b1 >> 1) & 3  # 3=Layer I, 2=Layer II, 1=Layer III
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code
    br_idx, sr_idx = b2 >> 4, (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    table = _MP3_BITRATE_V1 if version == 3 else _MP3_BITRATE_V2
    return {
        "kind": "audio",
        "format": "mp3",
        "mpeg_version": {3: 1, 2: 2, 0: 25}[version],
        "layer": layer,
        "bitrate_kbps": table[layer][br_idx],
        "sample_rate": _MP3_SAMPLE_RATES[version][sr_idx],
        "channels": 1 if (b3 >> 6) == 3 else 2,
    }


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO BMFF boxes in
    data[start:end]; handles 64-bit largesize, stops on malformed."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to end of file
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _mp4_meta(data: bytes) -> dict | None:
    """MP4/MOV metadata off the box structure alone: ftyp major brand +
    the first video trak's tkhd width/height (16.16 fixed point; v0 and
    v1 layouts) — no codec, mirroring the image sniffers."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    meta: dict = {
        "kind": "video",
        "format": "mp4",
        "brand": data[8:12].decode("ascii", "replace").strip(),
    }
    for btype, b0, b1 in _mp4_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for t, t0, t1 in _mp4_boxes(data, b0, b1):
            if t != b"trak":
                continue
            for h, h0, h1 in _mp4_boxes(data, t0, t1):
                if h != b"tkhd":
                    continue
                ver = data[h0]
                off = h0 + (88 if ver == 1 else 76)
                if off + 8 > h1:
                    continue
                w = int.from_bytes(data[off : off + 4], "big") >> 16
                hh = int.from_bytes(data[off + 4 : off + 8], "big") >> 16
                if w and hh:  # audio traks carry 0x0 — skip them
                    meta["width"], meta["height"] = w, hh
                    return meta
    return meta  # ftyp matched: still mp4, dims unknown/audio-only


def sniff_media_meta(payload: bytes) -> dict | None:
    """Typed container metadata for ANY supported modality — images
    (PNG/GIF/BMP/JPEG/WebP via :func:`sniff_image_dims`), WAV (RIFF fmt
    chunk: channels/sample-rate/bits), MP3 (frame header, ID3v2-aware:
    bitrate/sample-rate/channels), MP4/MOV (ftyp brand + moov/tkhd
    dimensions).  Pure header byte parsing, no codec; None when no
    container magic matches (callers fall back to their stand-in)."""
    img = sniff_image_dims(payload)
    if img is not None:
        fmt, w, h = img
        return {"kind": "image", "format": fmt, "width": w, "height": h}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _wav_meta(payload)
    if len(payload) >= 8 and payload[4:8] == b"ftyp":
        return _mp4_meta(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return _mp3_meta(payload)
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
            # real container metadata when the payload IS media — image
            # dims via sniff_image_dims, MP4 video dims via the tkhd box
            # (sniff_media_meta routes on magic); the deterministic
            # size-keyed stand-in otherwise (the synthetic text corpus
            # always falls back, so the SQL oracle's octet_length math
            # holds; audio containers carry no dims and fall back too)
            sniffed = pdf["payload"].map(sniff_media_meta)
            dims = pd.Series(
                [
                    (s["width"], s["height"])
                    if s is not None and "width" in s
                    else fake_decode_dims(n)
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


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("bits", T.LongType(), True),
        T.StructField("bitrate_kbps", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("brand", T.StringType(), True),
    ]
)

_MEDIA_META_COLS = (
    "kind", "format", "width", "height", "sample_rate", "channels",
    "bits", "bitrate_kbps", "duration_sec", "brand",
)


def extract_media_meta(blobs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Typed container metadata for a mixed-modality binary column —
    one Arrow-batched pass mapping each payload through
    :func:`sniff_media_meta` into a flat typed schema (kind/format +
    image/video dims + audio sample-rate/channels/bits/bitrate).
    Unrecognized payloads keep NULL kind: at 100 TB the follow-on
    groupBy(kind, format) is the corpus inventory every multimodal
    pipeline runs first, and the declared schema lets Catalyst prune
    to exactly the columns that query needs."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in _MEDIA_META_COLS}
            for payload in pdf["payload"]:
                m = sniff_media_meta(bytes(payload)) or {}
                for c in _MEDIA_META_COLS:
                    rows[c].append(m.get(c))
            out = pd.DataFrame({"doc_id": pdf[id_col], **rows})
            for c in ("width", "height", "sample_rate", "channels",
                      "bits", "bitrate_kbps"):
                out[c] = out[c].astype("Int64")
            yield out

    return blobs.select(id_col, "payload").mapInPandas(_meta, MEDIA_META_SCHEMA)


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
