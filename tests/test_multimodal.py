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


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


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
