"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Design for a 100 TB media corpus: the media payload is an opaque
``binary`` column (or a pointer column to object storage for >~10 MB
blobs), typed metadata travels alongside in ordinary columns, and all
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — one
Python worker pass, no row-at-a-time serde, schema declared up front so
Catalyst can prune.

The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED (``decode_image`` raises NotImplementedError; the pipeline
uses ``fake_decode_dims``, a deterministic stand-in keyed on payload
bytes).  Everything Spark-side — schema, batching, UDF signature,
partition behavior — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image(payload: bytes) -> object:
    """Real decoder entry point — requires an image codec (PIL/libvips),
    not present in this environment."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this container; "
        "swap fake_decode_dims for a real decoder in production"
    )


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
            dims = n_bytes.map(fake_decode_dims)
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
