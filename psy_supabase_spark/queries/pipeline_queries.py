"""Pipeline queries: multimodal plumbing + model-stub gates.

``multimodal_features`` runs a REAL Arrow-batched ``mapInPandas`` over
binary payloads; the fake decode is a pure function of payload size, so
DuckDB reproduces it from octet_length — the UDF plumbing is what's under
test.  ``toxicity_gate`` mirrors the reference's safety→toxicity routing
with the portable-hash stub score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ml_udfs, multimodal
from ..registry import register
from ..sources.catalog import load_table


@register(
    "multimodal_features",
    oracle=f"""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    f AS (
      SELECT doc_id, n,
             CAST(ceil(n::DOUBLE / {multimodal.FRAME_SIZE}) AS BIGINT) AS n_frames
      FROM b
    )
    SELECT doc_id,
           n AS n_bytes,
           (n % 640) + 1 AS fake_width,
           ((n * 7) % 480) + 1 AS fake_height,
           n_frames,
           CAST(floor((n_frames + {multimodal.FRAME_STRIDE - 1}) / {multimodal.FRAME_STRIDE}) AS BIGINT) AS n_sampled,
           COALESCE(list_sum(list_transform(range(n_frames),
             i -> CASE WHEN i % {multimodal.FRAME_STRIDE} = 0
                       THEN least({multimodal.FRAME_SIZE}, n - {multimodal.FRAME_SIZE} * i)
                       ELSE 0 END)), 0)::BIGINT AS sampled_len_sum,
           least(n, {multimodal.RESIZE_W * multimodal.RESIZE_H}) AS resized_n_bytes
    FROM f
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas: payload stats,
    decode-stub dims, REAL frame slicing (FRAME_SIZE chunks, every
    FRAME_STRIDE-th kept) and the resize cap — the SQL oracle reproduces
    the structural math from octet_length, so the Arrow plumbing and the
    chunking code are what's under test (operators/multimodal)."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.extract_blob_features(multimodal.attach_blobs(docs))


@register(
    "toxicity_gate",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             ROUND((CAST(('0x' || substr(md5(lower(text)), 1, 8)) AS BIGINT) % 1000)::DOUBLE / 1000.0,
                   6) AS tox_score,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_words
      FROM documents
    )
    SELECT doc_id, tox_score,
           CASE WHEN n_words < 5 THEN FALSE ELSE tox_score > 0.7 END AS toxic
    FROM scored
    """,
)
def toxicity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 parity: toxicity gate with the <5-words short-circuit (reference
    text_generator.py:273-275, 294); deterministic stub score."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ml_udfs.toxicity_score("text").alias("tox_score"),
        ml_udfs.is_toxic("text").alias("toxic"),
    )


@register(
    "embed_documents_stub",
    oracle="SELECT doc_id, CAST(64 AS BIGINT) AS dim, CAST(1.0 AS DOUBLE) AS norm FROM documents",
)
def embed_documents_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: batch embedding generation through the real pandas-UDF path
    (deterministic hash-stub model).  The RNG values aren't SQL, but the
    CONTRACT is: every embedding has dim 64 and unit norm — the oracle
    asserts exactly that, so a broken UDF (nan, wrong dim, missing rows)
    fails the gate."""
    from ..functions import vector as V

    docs = load_table(spark, sf_dir, "documents")
    embed = ml_udfs.hash_embedding_udf(64)
    out = docs.select("doc_id", embed(F.col("text")).alias("embedding"))
    return out.select(
        "doc_id", F.size("embedding").cast("bigint").alias("dim"), F.round(V.l2_norm("embedding"), 3).alias("norm")
    )
