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
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return blobs.select(id_col, "payload").mapInPandas(_extract, BLOB_FEATURES_SCHEMA)
