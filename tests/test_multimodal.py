"""Multimodal plumbing: binary column, Arrow batch shape, stubbed decode."""

from __future__ import annotations

import pytest

from psy_supabase_spark.operators import multimodal


def test_attach_and_extract(spark):
    docs = spark.createDataFrame([(1, "abc"), (2, "é"), (3, "")], "doc_id long, text string")
    blobs = multimodal.attach_blobs(docs)
    assert dict(blobs.dtypes)["payload"] == "binary"
    feats = {r.doc_id: r for r in multimodal.extract_blob_features(blobs).collect()}
    assert feats[1].n_bytes == 3
    assert feats[2].n_bytes == 2  # é is 2 UTF-8 bytes — byte length, not char length
    assert feats[3].n_bytes == 0
    w, h = multimodal.fake_decode_dims(3)
    assert (feats[1].fake_width, feats[1].fake_height) == (w, h)


import struct


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    return (
        multimodal.PNG_MAGIC
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + b"\x00\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _bmp(w: int, h: int) -> bytes:
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40, dims as signed LE i32)
    return (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
    )


def _jpeg(w: int, h: int, *, sof: int = 0xC0) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_seg = (
        bytes([0xFF, sof])
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof_seg + b"\xff\xda\x00\x02" + b"entropy..."


def test_sniff_image_dims_real_headers():
    """Real container-header bytes of all four formats parse to real
    dimensions — no codec library involved (public byte layouts: PNG
    IHDR, GIF logical screen, BMP info header, JPEG SOFn)."""
    assert multimodal.sniff_image_dims(_png(640, 480)) == ("png", 640, 480)
    assert multimodal.sniff_image_dims(_gif(320, 200)) == ("gif", 320, 200)
    assert multimodal.sniff_image_dims(_bmp(800, 600)) == ("bmp", 800, 600)
    # top-down BMP stores negative height; dims are reported positive
    assert multimodal.sniff_image_dims(_bmp(800, -600)) == ("bmp", 800, 600)
    assert multimodal.sniff_image_dims(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    # progressive JPEG (SOF2) and baseline-extended (SOF1) also carry dims
    assert multimodal.sniff_image_dims(_jpeg(99, 77, sof=0xC2)) == ("jpeg", 99, 77)
    assert multimodal.sniff_image_dims(_jpeg(99, 77, sof=0xC1)) == ("jpeg", 99, 77)
    # non-images and truncated magics fall through to None
    assert multimodal.sniff_image_dims(b"just text") is None
    assert multimodal.sniff_image_dims(b"\x89PNG") is None
    assert multimodal.sniff_image_dims(b"\xff\xd8\xff\xd9") is None  # SOI+EOI only


def _webp_vp8l(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", bits) + b"\x00"
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _webp_vp8(w: int, h: int) -> bytes:
    frame = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 4
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _webp_vp8x(w: int, h: int) -> bytes:
    payload = b"\x00" + b"\x00" * 3 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_sniff_webp_variants():
    """All three WebP container flavors parse: lossy VP8 (sync-coded
    frame header), lossless VP8L (LSB-packed 14-bit fields), extended
    VP8X (24-bit canvas minus one)."""
    assert multimodal.sniff_image_dims(_webp_vp8(480, 360)) == ("webp", 480, 360)
    assert multimodal.sniff_image_dims(_webp_vp8l(1280, 720)) == ("webp", 1280, 720)
    assert multimodal.sniff_image_dims(_webp_vp8x(4096, 2160)) == ("webp", 4096, 2160)
    # RIFF but not WebP (e.g. WAV) falls through
    assert multimodal.sniff_image_dims(b"RIFF\x00\x00\x00\x00WAVEfmt ") is None


def test_decode_image_tiers():
    """Metadata tier works codec-free; only the pixel tier is stubbed."""
    assert multimodal.decode_image(_png(12, 34)) == {
        "format": "png", "width": 12, "height": 34,
    }
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(_png(12, 34), pixels=True)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"not an image")


def test_extract_uses_sniffer_when_magic_matches(spark):
    """extract_blob_features reports REAL dims for real image payloads
    and the deterministic size-keyed stand-in otherwise."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [_gif(320, 200), b"plain text", _jpeg(64, 32)]}
    )
    blobs = spark.createDataFrame(pdf)
    feats = {r.doc_id: r for r in multimodal.extract_blob_features(blobs).collect()}
    assert (feats[1].fake_width, feats[1].fake_height) == (320, 200)
    assert (feats[3].fake_width, feats[3].fake_height) == (64, 32)
    fw, fh = multimodal.fake_decode_dims(len(b"plain text"))
    assert (feats[2].fake_width, feats[2].fake_height) == (fw, fh)


def test_extract_schema_stable(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = multimodal.extract_blob_features(multimodal.attach_blobs(docs))
    assert out.schema == multimodal.BLOB_FEATURES_SCHEMA


def test_sample_frames_variable_rows(spark):
    docs = spark.createDataFrame(
        [(1, "a" * 1000), (2, "b" * 100), (3, "")], "doc_id long, text string"
    )
    blobs = multimodal.attach_blobs(docs)
    frames = multimodal.sample_frames(blobs).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 1000 bytes -> 4 frames of 256 (last 232); stride 4 keeps frame 0 only
    assert [r.frame_idx for r in by_doc[1]] == [0]
    assert len(bytes(by_doc[1][0].frame)) == 256
    assert [len(bytes(r.frame)) for r in by_doc[2]] == [100]
    assert 3 not in by_doc  # empty payload yields no frames


def test_audio_window_means_deterministic(spark):
    docs = spark.createDataFrame([(1, "abcd" * 600)], "doc_id long, text string")
    out = multimodal.audio_window_means(multimodal.attach_blobs(docs)).head()
    payload = ("abcd" * 600).encode()
    want = [
        sum(payload[i : i + 1024]) / len(payload[i : i + 1024])
        for i in range(0, len(payload), 1024)
    ]
    assert out.window_means == pytest.approx(want)


def test_resize_stub_cap(spark):
    assert len(multimodal.resize_stub_bytes(b"x" * 10_000)) == 64 * 48
    assert multimodal.resize_stub_bytes(b"xy") == b"xy"


def _wav(sr: int = 44100, ch: int = 2, bits: int = 16, n_data: int = 4000) -> bytes:
    byte_rate = sr * ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sr, byte_rate, ch * bits // 8, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", n_data) + b"\x00" * n_data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mp3(*, id3: bool = False) -> bytes:
    # 0xFF 0xFB 0x90 0x00: MPEG1 Layer III, 128 kbps, 44100 Hz, stereo
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32
    if id3:
        return b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10 + frame
    return frame


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_tkhd(w: int, h: int, *, version: int = 0) -> bytes:
    if version == 0:
        body = bytes([0, 0, 0, 7]) + b"\x00" * 20 + b"\x00" * 8
    else:
        body = bytes([1, 0, 0, 7]) + b"\x00" * 32 + b"\x00" * 8
    body += b"\x00" * 8 + b"\x00" * 36  # layer/alt/volume/reserved + matrix
    body += struct.pack(">II", w << 16, h << 16)
    return _mp4_box(b"tkhd", body)


def _mp4(w: int, h: int, *, version: int = 0, audio_trak_first: bool = False) -> bytes:
    ftyp = _mp4_box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2")
    traks = b""
    if audio_trak_first:
        traks += _mp4_box(b"trak", _mp4_tkhd(0, 0, version=version))
    traks += _mp4_box(b"trak", _mp4_tkhd(w, h, version=version))
    return ftyp + _mp4_box(b"moov", traks)


def test_sniff_wav_fmt_chunk():
    m = multimodal.sniff_media_meta(_wav(sr=22050, ch=1, bits=8, n_data=22050))
    assert m == {
        "kind": "audio", "format": "wav", "channels": 1,
        "sample_rate": 22050, "bits": 8, "duration_sec": 1.0,
    }
    # fmt chunk after an odd-sized leading chunk (word-alignment walk)
    wav = _wav()
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    wav = wav[:12] + extra + wav[12:]
    m = multimodal.sniff_media_meta(wav)
    assert m is not None and m["sample_rate"] == 44100 and m["channels"] == 2
    # RIFF that is not WAVE is not audio
    assert multimodal.sniff_media_meta(b"RIFF\x00\x00\x00\x00AVI LIST") is None


def test_sniff_mp3_frame_header():
    m = multimodal.sniff_media_meta(_mp3())
    assert (m["kind"], m["format"]) == ("audio", "mp3")
    assert m["bitrate_kbps"] == 128 and m["sample_rate"] == 44100
    assert m["channels"] == 2 and m["mpeg_version"] == 1 and m["layer"] == 3
    # ID3v2-prefixed file: tag skipped via syncsafe size
    m = multimodal.sniff_media_meta(_mp3(id3=True))
    assert m is not None and m["bitrate_kbps"] == 128
    # MPEG2 Layer III mono: 0xFF 0xF3 0x80 0xC0 -> 64 kbps, 22050 Hz
    m = multimodal.sniff_media_meta(bytes([0xFF, 0xF3, 0x80, 0xC0]))
    assert m["bitrate_kbps"] == 64 and m["sample_rate"] == 22050
    assert m["channels"] == 1 and m["mpeg_version"] == 2
    # reserved version / bad bitrate index / bad sample rate -> None
    assert multimodal.sniff_media_meta(bytes([0xFF, 0xEB, 0x90, 0x00])) is None
    assert multimodal.sniff_media_meta(bytes([0xFF, 0xFB, 0xF0, 0x00])) is None
    assert multimodal.sniff_media_meta(bytes([0xFF, 0xFB, 0x9C, 0x00])) is None


def test_sniff_mp4_tkhd_dims():
    m = multimodal.sniff_media_meta(_mp4(1920, 1080))
    assert (m["kind"], m["format"], m["brand"]) == ("video", "mp4", "isom")
    assert (m["width"], m["height"]) == (1920, 1080)
    # v1 tkhd (64-bit times shift the dims offset)
    m = multimodal.sniff_media_meta(_mp4(640, 360, version=1))
    assert (m["width"], m["height"]) == (640, 360)
    # the 0x0 audio trak is skipped; the video trak's dims win
    m = multimodal.sniff_media_meta(_mp4(1280, 720, audio_trak_first=True))
    assert (m["width"], m["height"]) == (1280, 720)
    # ftyp without a parseable video trak still identifies the container
    ftyp_only = _mp4_box(b"ftyp", b"mp42" + b"\x00" * 8)
    m = multimodal.sniff_media_meta(ftyp_only)
    assert m["format"] == "mp4" and "width" not in m


def test_extract_blob_features_routes_mp4_dims(spark):
    """extract_blob_features routes on magic across modalities: MP4
    video dims come off the tkhd box, not the size stand-in."""
    import pandas as pd

    payloads = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [_mp4(1920, 1080), b"plain text"]}
    )
    blobs = spark.createDataFrame(payloads)
    feats = {r.doc_id: r for r in multimodal.extract_blob_features(blobs).collect()}
    assert (feats[1].fake_width, feats[1].fake_height) == (1920, 1080)
    w, h = multimodal.fake_decode_dims(len(b"plain text"))
    assert (feats[2].fake_width, feats[2].fake_height) == (w, h)


def test_extract_media_meta_mixed_modalities(spark):
    import pandas as pd

    payloads = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "payload": [
                _png(10, 20), _wav(), _mp3(), _mp4(320, 240), b"not media",
            ],
        }
    )
    blobs = spark.createDataFrame(payloads)
    out = multimodal.extract_media_meta(blobs)
    rows = {r.doc_id: r for r in out.collect()}
    assert (rows[1].kind, rows[1].format, rows[1].width, rows[1].height) == (
        "image", "png", 10, 20,
    )
    assert (rows[2].kind, rows[2].sample_rate, rows[2].channels, rows[2].bits) == (
        "audio", 44100, 2, 16,
    )
    assert (rows[3].format, rows[3].bitrate_kbps) == ("mp3", 128)
    assert (rows[4].kind, rows[4].width, rows[4].brand) == ("video", 320, "isom")
    assert rows[5].kind is None and rows[5].format is None
    # corpus inventory: the groupBy every multimodal pipeline runs first
    inv = {r.kind: r["count"] for r in out.groupBy("kind").count().collect()}
    assert inv == {"image": 1, "audio": 2, "video": 1, None: 1}
