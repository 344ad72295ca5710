"""GEMM batch ANN serving (ivf.ivf_search_batch_gemm) and the synthetic
wide-dim / scale-step corpora (sources/synth).

The GEMM path exists because the expression path's per-element HOF fold
and per-centroid literal expressions stop being the right trade at the
reference's real dimensionality (vector(1536), query.txt:84) — parity
with the expression path is pinned here at dim 64, and the wide path is
smoke-validated at dim 1536."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from psy_supabase_spark.operators import ivf, topk
from psy_supabase_spark.sources.catalog import load_table
from psy_supabase_spark.sources.synth import scaled_documents, synthetic_embeddings

SF = "/root/testdata/sf0.001"


def _rows(df):
    return {
        (r[0], r[1], r[2], r[3])
        for r in df.select("query_id", "vec_id", "similarity", "rank").collect()
    }


def test_gemm_batch_parity_with_expression_path(spark):
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=8)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    expr = _rows(ivf.ivf_search_batch(index, queries, k=5, nprobe=3))
    gemm = _rows(ivf.ivf_search_batch_gemm(index, queries, k=5, nprobe=3))
    assert gemm == expr


def test_gemm_sq8_parity_with_expression_sq8(spark):
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=8)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    store = ivf.quantized_store(index)
    expr = _rows(
        ivf.ivf_search_batch(index, queries, k=5, nprobe=3, sq8=True, sq8_store=store)
    )
    gemm = _rows(
        ivf.ivf_search_batch_gemm(index, queries, k=5, nprobe=3, sq8_store=store)
    )
    assert gemm == expr


def test_gemm_full_probe_equals_exact(spark):
    """nprobe = n_lists ⇒ the GEMM path IS brute force — must equal the
    expression-path exact top-k."""
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=4)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    exact = [(r.vec_id, r.similarity) for r in topk.topk_similarity(emb, qvec, k=5).collect()]
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    gemm = [
        (r.vec_id, r.similarity)
        for r in ivf.ivf_search_batch_gemm(index, queries, k=5, nprobe=4)
        .orderBy("rank")
        .collect()
    ]
    assert gemm == exact


def test_synth_embeddings_deterministic_and_wide(spark):
    a = synthetic_embeddings(spark, 200, 1536, n_modes=8, partitions=3)
    b = synthetic_embeddings(spark, 200, 1536, n_modes=8, partitions=11)
    ra = {r.vec_id: tuple(r.embedding[:5]) for r in a.collect()}
    rb = {r.vec_id: tuple(r.embedding[:5]) for r in b.collect()}
    assert ra == rb and len(ra) == 200
    dim = a.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dim] == [1536]


def test_dim1536_gemm_search_finds_self(spark):
    corpus = synthetic_embeddings(spark, 500, 1536, n_modes=8)
    index = ivf.build_ivf(corpus, n_lists=8)
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = ivf.ivf_search_batch_gemm(index, queries, k=3, nprobe=2).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        best = min(rows, key=lambda r: r.rank)
        assert best.vec_id == qid and best.similarity > 0.999999
    assert set(by_q) == {0, 1, 2}


def test_scaled_documents_preserves_dup_structure(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),  # exact dup of 0
            (2, "something entirely different here"),
            (3, "numbers 12345 only words too"),
        ],
        "doc_id long, text string",
    )
    from psy_supabase_spark.operators import dedup

    base_groups = dedup.exact_dedup(docs).count()
    tripled = scaled_documents(docs, 3)
    assert tripled.count() == 12
    # Caesar rotation is a bijection: each copy contributes the SAME group
    # structure, and cross-copy texts never collide (all docs have letters)
    assert dedup.exact_dedup(tripled).count() == 3 * base_groups
    # copy 0 is verbatim
    orig = {r.text for r in docs.collect()}
    kept = {r.text for r in tripled.where(F.col("doc_id") < 100).collect()}
    assert kept == orig
