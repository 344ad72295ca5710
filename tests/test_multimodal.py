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
