"""Vector retrieval queries (SURVEY.md §2.3 J1/J2, §2.4 A4, extended ANN).

Oracle cosine uses DuckDB ``list_dot_product`` after an explicit
``::DOUBLE[]`` cast so both engines accumulate in float64; scores are
rounded to 6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vector as V
from ..operators import topk
from ..registry import register
from ..sources.catalog import load_table

TOPK = 5
QUERY_ID = 0  # fixed seeded query vector = embedding of vec_id 0 (FIXTURES.md)


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = QUERY_ID) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return list(row[0])


_COS_SQL = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) / "
    "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])))"
)


@register(
    "vector_topk_similarity",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_ID})
    SELECT e.vec_id, (ROUND({_COS_SQL}, 6) + 0.0) AS similarity
    FROM embeddings e, q
    WHERE sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) > 0
      AND sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) > 0
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {TOPK}
    """,
)
def vector_topk_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 client semantics: cosine similarity DESC top-k
    (reference rag_processor.py:26-75)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk.topk_similarity(emb, _query_vec(spark, sf_dir), k=TOPK)


@register(
    "vector_topk_distance",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_ID})
    SELECT e.vec_id, (ROUND(1.0 - {_COS_SQL}, 6) + 0.0) AS distance
    FROM embeddings e, q
    WHERE sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) > 0
      AND sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) > 0
    ORDER BY distance ASC, e.vec_id ASC
    LIMIT {TOPK}
    """,
)
def vector_topk_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 server semantics: pgvector `<=>` cosine distance ASC LIMIT k
    (reference query.txt:186-205)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk.topk_distance(emb, _query_vec(spark, sf_dir), k=TOPK)


def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-row L2 norm + dimension (reference rag_processor.py:57).
    Precomputed at ingest in the engine to halve query-time cosine cost.
    Unregistered since the registry consolidation: the same columns are
    driver-gated inside `embedding_codec_roundtrip`; kept for tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        V.round6(V.l2_norm("embedding")).alias("l2_norm"),
        F.size("embedding").cast("bigint").alias("dim"),
    )


@register(
    "knn_join_multi",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id, (ROUND({_COS_SQL}, 6) + 0.0) AS similarity
      FROM embeddings e, q
      WHERE sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) > 0
        AND sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) > 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY similarity DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, similarity, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3
    """,
)
def knn_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-to-M brute-force KNN join: 5 query vectors (vec_id < 5) × corpus,
    top-3 each.  Query side broadcast; corpus streamed once."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding"))
    )
    return topk.knn_join(emb, queries, k=3)


@register(
    "embedding_neardup_exact",
    oracle="""
    WITH sims AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                   (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                    sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS similarity
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) > 0
        AND sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) > 0
    )
    SELECT id_a, id_b, similarity FROM sims WHERE similarity >= 0.5
    """,
)
def embedding_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (sim ≥ 0.5).  O(N²)
    correctness baseline — the scale path is LSH bucketing (operators/lsh)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk.neighbors_above(emb, 0.5)


@register(
    "ann_pruned_topk_fixed_centroids",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_ID}),
    cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
    qdist AS (
      SELECT cid,
             1 - list_dot_product(cv::DOUBLE[], qv::DOUBLE[]) /
                 (sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[])) *
                  sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))) AS d
      FROM cents, q
    ),
    probes AS (SELECT cid FROM qdist ORDER BY d ASC NULLS LAST, cid ASC LIMIT 2),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY 1 - list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[]) /
                          (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                           sqrt(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[]))) ASC NULLS LAST,
                          c.cid ASC
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT e.vec_id, (ROUND({_COS_SQL}, 6) + 0.0) AS similarity
    FROM embeddings e
    JOIN assigned a ON a.vec_id = e.vec_id
    JOIN probes p ON p.cid = a.cid
    CROSS JOIN q
    WHERE sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) > 0
      AND sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) > 0
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT {TOPK}
    """,
)
def ann_pruned_topk_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 pruning logic, ORACLE-GATED: IVF with a deterministic centroid
    set (the 8 vectors vec_id<8) instead of KMeans — assignment via
    broadcast distance-rank window, probe selection via distance top-2,
    pruned exact top-k within.  Proves the prune/assign/rank machinery
    bit-for-bit; the KMeans twin (ann_ivf_topk) adds learned centroids."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    qvec = _query_vec(spark, sf_dir)
    qlit = V.query_vector_lit(qvec)

    d_assign = F.lit(1.0) - V.cosine_similarity(F.col("embedding"), F.col("cv"))
    w = Window.partitionBy("vec_id").orderBy(d_assign.asc_nulls_last(), F.col("cid").asc())
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    d_query = F.lit(1.0) - V.cosine_similarity(F.col("cv"), qlit)
    probes = (
        cents.select("cid", d_query.alias("d"))
        .orderBy(F.col("d").asc_nulls_last(), F.col("cid").asc())
        .limit(2)
        .select("cid")
    )
    pruned = emb.join(assigned, "vec_id").join(F.broadcast(probes), "cid")
    return topk.topk_similarity(pruned, qvec, k=TOPK)
