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


def test_quantized_store_arrow_parity(spark):
    """Arrow/numpy quantization must be ROW-IDENTICAL to the codegen HOF
    spelling (HALF_UP rounding, scale, int8 codes, coarse norm)."""
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=4)
    expr = {
        r.vec_id: (r.centroid_id, r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=False).collect()
    }
    arrow = {
        r.vec_id: (r.centroid_id, r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=True).collect()
    }
    assert arrow == expr


def test_quantized_store_arrow_handles_halfway_and_zero(spark):
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.5, -0.5, 0.0]),   # ±63.5 after scaling → HALF_UP ±64
            (1, [0.0, 0.0, 0.0, 0.0]),    # zero vector → scale 1, all-0 codes
        ],
        "vec_id long, embedding array<float>",
    )
    index = ivf.IVFIndex(centers=[[1.0, 0.0, 0.0, 0.0]], assigned=None)
    index.assigned = ivf.assign_to_centroids(df, index.centers)
    expr = {
        r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=False).collect()
    }
    arrow = {
        r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=True).collect()
    }
    assert arrow == expr
    assert expr[0][1] == (127, 64, -64, 0)
    assert expr[1][1] == (0, 0, 0, 0)


def test_srp_arrow_verify_parity(spark):
    """Arrow GEMM verify must emit the same pairs (ids AND rounded sims)
    as the expression-fold verify at dim 64."""
    from psy_supabase_spark.operators import lsh

    emb = load_table(spark, SF, "embeddings")
    expr = {
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(emb, 0.3, verify_arrow=False).collect()
    }
    arrow = {
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(emb, 0.3, verify_arrow=True).collect()
    }
    assert arrow == expr and len(expr) > 0


def test_cosine_pairs_np_degenerate_rows(spark):
    """Zero-norm / NULL / ragged rows must never survive the threshold
    filter (NaN folded to NULL before comparison)."""
    from psy_supabase_spark.operators import lsh

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], [1.0, 0.0]),
            (1, [0.0, 0.0], [1.0, 0.0]),   # zero norm
            (2, None, [1.0, 0.0]),          # NULL side
            (3, [1.0], [1.0, 0.0]),         # ragged
        ],
        "pid long, va array<double>, vb array<double>",
    )
    raw = lsh.cosine_pairs_np(F.col("va"), F.col("vb"))
    sim = F.when(F.isnan(raw), F.lit(None).cast("double")).otherwise(raw)
    out = df.select("pid", sim.alias("s")).where(F.col("s") >= 0.5).collect()
    assert [r.pid for r in out] == [0]


def test_suggest_banding_scales_linearly():
    from psy_supabase_spark.operators.lsh import suggest_banding

    n1, b1 = suggest_banding(5_000, 0.9)
    n10, b10 = suggest_banding(50_000, 0.9)
    bits1, bits10 = n1 // b1, n10 // b10
    assert bits10 > bits1  # deeper corpus → more bits per band
    # expected bucket depth stays bounded → candidates ~linear in N
    assert 50_000 / (1 << bits10) <= 64
    # recall at the threshold stays ≥ ~0.9 for both configs
    import math

    for bits, bands in ((bits1, b1), (bits10, b10)):
        p = 1 - math.acos(0.9) / math.pi
        assert 1 - (1 - p**bits) ** bands >= 0.9


def test_suggest_banding_low_threshold_clamps():
    from psy_supabase_spark.operators.lsh import suggest_banding

    n, b = suggest_banding(1_000_000, 0.5)
    assert b <= 32 and n // b <= 20  # clamped, not unbounded


def test_batch_search_auto_routes_to_gemm(spark):
    """n_lists x dim >= GEMM_ROUTE_CELLS auto-delegates ivf_search_batch
    to the GEMM path — rows must equal the pinned expression spelling."""
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=80)  # 80 x 64 = 5120 >= 4096
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    auto = _rows(ivf.ivf_search_batch(index, queries, k=5, nprobe=3))
    expr = _rows(ivf.ivf_search_batch(index, queries, k=5, nprobe=3, gemm=False))
    assert auto == expr


def test_dim2048_smoke_all_kernels(spark):
    """The reference's ACTUAL embedding width is 2048 (text_generator.py:
    314-316, vs the declared vector(1536) of query.txt:84) — one smoke
    over the full wide-dim kernel set at that width pins that nothing
    hard-codes a dimension: GEMM search, Arrow quantize + SQ8 ladder,
    PQ encode/ADC (m=16 -> dsub 128), Arrow verify."""
    from psy_supabase_spark.operators import lsh, pq

    corpus = synthetic_embeddings(spark, 300, 2048, n_modes=30, seed=7)
    index = ivf.build_ivf(corpus, n_lists=8)
    queries = corpus.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = ivf.ivf_search_batch(index, queries, k=3, nprobe=2).collect()  # auto-GEMM
    tops = {r.query_id: r.vec_id for r in got if r.rank == 1}
    assert tops == {0: 0, 1: 1}

    store = ivf.quantized_store(index)  # auto-Arrow at this width
    got = ivf.ivf_search_batch_gemm(index, queries, k=3, nprobe=2, sq8_store=store).collect()
    assert {r.query_id: r.vec_id for r in got if r.rank == 1} == {0: 0, 1: 1}

    books = pq.pq_fit(corpus, m=16, fit_sample_cap=300)
    assert books.dsub == 128
    enc = pq.pq_encode(corpus, books)
    got = pq.pq_search_batch(enc, queries, books, corpus, k=3).collect()  # auto-Arrow rescore
    assert {r.query_id: r.vec_id for r in got if r.rank == 1} == {0: 0, 1: 1}

    n_planes, bands = lsh.suggest_banding(300, 0.9)
    pairs = lsh.srp_neardup_pairs(
        corpus, 0.9, dim=2048, n_planes=n_planes, bands=bands
    )  # auto-Arrow verify
    assert pairs.count() > 0  # 10 near-copies per mode -> plenty of pairs


def test_knn_join_gemm_parity(spark):
    """Brute-force GEMM KNN must equal the expression knn_join exactly."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    expr = {
        (r.query_id, r.vec_id, r.similarity, r.rank)
        for r in topk.knn_join(emb, queries, k=4).collect()
    }
    gemm = {
        (r.query_id, r.vec_id, r.similarity, r.rank)
        for r in topk.knn_join_gemm(emb, queries, k=4).collect()
    }
    assert gemm == expr and len(expr) == 20


def test_gemm_search_prunes_persisted_wide_layout(spark, tmp_path):
    """The GEMM batch path over a persisted partitionBy(centroid_id)
    layout must keep FILE-LEVEL partition pruning at width — the probe
    union filter sits below the mapInPandas scorer, so only probed list
    directories are read."""
    import re as _re

    corpus = synthetic_embeddings(spark, 1000, 512, n_modes=8, seed=11)
    index = ivf.build_ivf(corpus, n_lists=8)
    path = str(tmp_path / "wide_layout")
    ivf.write_ivf_layout(index, path)
    stored = ivf.IVFIndex(centers=index.centers, assigned=spark.read.parquet(path))
    queries = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    out = ivf.ivf_search_batch_gemm(stored, queries, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[[^\]]*centroid_id", plan)
    got = {r.query_id: r.vec_id for r in out.collect() if r.rank == 1}
    assert got == {0: 0, 1: 1, 2: 2}


def test_quantized_store_arrow_parity_knife_edges(spark):
    """Adversarial sweep at the HALF_UP boundaries: elements engineered
    so x/scale lands on (or a ulp around) k+0.5 for many k, plus sign
    flips and near-zero values — the two rounding spellings must agree
    on every code."""
    rows = []
    vid = 0
    for denom_max in (1.0, 3.7, 127.0):
        scale = denom_max / 127.0
        elems = [denom_max]  # pins the scale
        for k in range(0, 126, 7):
            elems += [(k + 0.5) * scale, -(k + 0.5) * scale]
        for eps in (1e-16, -1e-16):
            elems += [(63.5 + eps) * scale]
        elems += [0.0, scale * 1e-12, -scale * 1e-12]
        # pad to a fixed dim of 64
        elems = (elems + [0.0] * 64)[:64]
        rows.append((vid, [float(x) for x in elems]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = ivf.IVFIndex(centers=[[1.0] + [0.0] * 63], assigned=None)
    index.assigned = ivf.assign_to_centroids(df, index.centers)
    expr = {
        r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=False).collect()
    }
    arrow = {
        r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=True).collect()
    }
    assert arrow == expr


def test_scaled_documents_factor_guard(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    # affine-cipher construction (r9): 12 coprime multipliers x 26 shifts
    with _pytest.raises(ValueError, match="bijections"):
        scaled_documents(docs, 313)
    # 27 is now legal (the old Caesar-only cap was 26) - distinct text
    a27 = scaled_documents(docs, 28)
    texts = [r.text for r in a27.collect()]
    assert len(set(texts)) == len(texts)


def test_scaled_documents_dup_structure_beyond_caesar_cap(spark):
    """Above 26 copies the bijections switch to a != 1 affine maps; the
    within-copy duplicate structure must still replicate exactly and no
    cross-copy verbatim collapse may appear."""
    from psy_supabase_spark.operators import dedup

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta gamma"), (2, "delta eps zeta")],
        "doc_id long, text string",
    )
    base_groups = dedup.exact_dedup(docs).count()  # 2
    k = 28
    scaled = scaled_documents(docs, k)
    assert scaled.count() == 3 * k
    assert dedup.exact_dedup(scaled).count() == k * base_groups


def test_suggest_banding_invariants():
    """Property sweep: bounds hold and the recall target is met whenever
    the band count is not clamped."""
    import math

    from psy_supabase_spark.operators.lsh import suggest_banding

    for n in (100, 5_000, 50_000, 10**7, 10**9):
        for t in (0.5, 0.7, 0.9, 0.95, 0.99):
            n_planes, bands = suggest_banding(n, t)
            bits = n_planes // bands
            assert 3 <= bits <= 20 and 1 <= bands <= 32
            assert n_planes == bits * bands
            p = 1 - math.acos(t) / math.pi
            recall = 1 - (1 - p**bits) ** bands
            if bands < 32:  # unclamped → the 0.95 target must be met
                assert recall >= 0.95 - 1e-9


def test_quantized_store_arrow_skips_malformed(spark):
    """NULL / wrong-dim embeddings must be SKIPPED by the Arrow quant
    kernel (np.stack would otherwise crash the task) — the same ok-mask
    contract as pq_encode and the GEMM scorer.  The expression kernel
    NULLs such rows instead; every scoring path drops NULLs, so the
    SERVABLE row sets agree."""
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.5, -0.5, 0.0], 0),
            (1, None, 0),
            (2, [1.0], 0),  # wrong dim
            (3, [0.25, 0.25, 0.25, 0.25], 0),
        ],
        "vec_id long, embedding array<double>, centroid_id int",
    )
    index = ivf.IVFIndex(centers=[[1.0, 0.0, 0.0, 0.0]], assigned=df)
    arrow_rows = ivf.quantized_store(index, arrow=True).collect()
    assert sorted(r.vec_id for r in arrow_rows) == [0, 3]
    expr_ok = {
        r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm)
        for r in ivf.quantized_store(index, arrow=False).collect()
        if r._qs is not None
        and r._qs.q is not None
        and len(r._qs.q) == 4
    }
    got = {r.vec_id: (r._qs.scale, tuple(r._qs.q), r._qnorm) for r in arrow_rows}
    assert got == {k: expr_ok[k] for k in (0, 3)}


def test_ivf_search_batch_max_queries_passthrough(spark):
    """The GEMM auto-route's driver-side query fetch is bounded by
    max_queries — and ivf_search_batch must forward the caller's bound
    rather than hard-failing batches over the built-in default
    (ADVICE r6: previously-working large batches on wide indexes broke
    when the auto-route landed)."""
    import pytest

    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=8)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    with pytest.raises(ValueError, match="max_queries"):
        ivf.ivf_search_batch(index, queries, k=3, nprobe=2, gemm=True, max_queries=3)
    got = ivf.ivf_search_batch(
        index, queries, k=3, nprobe=2, gemm=True, max_queries=5
    )
    assert got.select("query_id").distinct().count() == 5


def test_auto_route_falls_back_on_oversized_batch(spark):
    """In AUTO mode a query batch over max_queries falls back to the
    expression path (same rows) instead of raising; explicit gemm=True
    keeps the hard error (r7: GEMM became the default route at every
    size, so the bound must not break large-batch callers)."""
    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=8)
    queries = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        auto = _rows(
            ivf.ivf_search_batch(index, queries, k=3, nprobe=2, max_queries=4)
        )
    expr = _rows(ivf.ivf_search_batch(index, queries, k=3, nprobe=2, gemm=False))
    assert auto == expr
    # ADVICE r7: the silent route change must be loud — the fallback warns
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("falling back" in m for m in msgs), msgs
    # sq8 stays honored through the fallback (expression path scores the
    # quantized store coarse-then-rescore, never silently full-precision)
    with warnings.catch_warnings(record=True) as caught_sq8:
        warnings.simplefilter("always")
        auto_sq8 = _rows(
            ivf.ivf_search_batch(
                index, queries, k=3, nprobe=2, max_queries=4, sq8=True
            )
        )
    expr_sq8 = _rows(
        ivf.ivf_search_batch(index, queries, k=3, nprobe=2, gemm=False, sq8=True)
    )
    assert auto_sq8 == expr_sq8
    assert any(
        "falling back" in str(w.message)
        for w in caught_sq8
        if w.category is RuntimeWarning
    )


def test_coarse_verify_row_identical_and_sound(spark):
    """The int8 coarse pre-verify must be a PURE optimization: output
    row-identical to the direct verify at both widths (the drop rule
    threshold - (eps_a + eps_b) is a sound quantization bound, so only
    provably-failing pairs are dropped), including degenerate rows
    (NULL / zero / wrong-length vectors)."""
    from psy_supabase_spark.operators import lsh
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    def rows(df):
        return {(r.id_a, r.id_b, r.similarity) for r in df.collect()}

    # narrow width (expression kernels), degenerate rows mixed in
    emb = load_table(spark, SF, "embeddings")
    degen = spark.createDataFrame(
        [(100001, None), (100002, [0.0] * 64), (100003, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(degen)
    plain = rows(lsh.srp_neardup_pairs(corpus, 0.5, coarse_verify=False))
    coarse = rows(lsh.srp_neardup_pairs(corpus, 0.5, coarse_verify=True))
    assert coarse == plain

    # wide width (Arrow kernels + auto coarse): planted near-dup modes.
    # verify_route pinned to "join" — the route where the coarse int8
    # pre-drop exists (auto would take the small-corpus broadcast route)
    wemb = synthetic_embeddings(spark, 1_000, 512, n_modes=100)
    np_, b_ = lsh.suggest_banding(1_000, 0.9, dim=512)
    kw = dict(dim=512, n_planes=np_, bands=b_, verify_route="join")
    wide_plain = rows(lsh.srp_neardup_pairs(wemb, 0.9, coarse_verify=False, **kw))
    wide_coarse = rows(lsh.srp_neardup_pairs(wemb, 0.9, **kw))  # auto → coarse ON
    assert wide_coarse == wide_plain
    assert len(wide_coarse) > 0  # planted modes must actually produce pairs


def test_srp_topk_recall_and_shape(spark):
    """SRP-bucketed ANN top-k (lsh.srp_topk): schema matches the other
    batch serving paths, the query's own vector tops its list, and
    recall@10 vs exact brute force is high on a clustered corpus (the
    banding targets candidate recall at high cosine)."""
    from psy_supabase_spark.operators import ivf, lsh
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    emb = synthetic_embeddings(spark, 2_000, 64, n_modes=200).cache()
    emb.count()
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = lsh.srp_topk(emb, queries, k=10, dim=64)
    assert got.columns == ["query_id", "vec_id", "similarity", "rank"]
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    # exact ground truth via the GEMM brute twin (single full probe)
    index = ivf.IVFIndex(
        centers=[[1.0] + [0.0] * 63],
        assigned=emb.withColumn("centroid_id", F.lit(0)),
    )
    gt = {}
    for r in ivf.ivf_search_batch_gemm(index, queries, k=10, nprobe=1).collect():
        gt.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    recalls = []
    for q, pairs in gt.items():
        want = {v for _, v in pairs}
        have = {v for _, v in by_q.get(q, [])}
        recalls.append(len(want & have) / 10.0)
        # self-hit must rank first (exact verify of candidates)
        assert sorted(by_q[q])[0][1] == q
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    emb.unpersist()


def test_srp_topk_brute_fallback_completes_exact_k(spark):
    """brute_fallback=True turns srp_topk's pre-filter semantics into an
    exact-k contract: queries whose buckets find < k candidates are
    re-served whole by the brute KNN join, while full queries keep the
    LSH rows.  With aggressive banding and k close to the corpus size,
    every query falls short — the result must then be row-identical to
    the exact brute join; and every query must always return exactly k
    rows."""
    from psy_supabase_spark.operators import lsh, topk
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    emb = synthetic_embeddings(spark, 300, 64, n_modes=30).cache()
    emb.count()
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    # 20-bit bands: buckets are near-singletons, so every query finds
    # far fewer than k=50 candidates and the fallback must kick in
    kw = dict(dim=64, n_planes=20, bands=1)
    partial = lsh.srp_topk(emb, queries, k=50, **kw)
    short = {
        r.query_id: r.n
        for r in partial.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n < 50 for n in short.values()) or len(short) < 8  # genuinely short
    full = lsh.srp_topk(emb, queries, k=50, brute_fallback=True, **kw)
    rows = sorted(
        (r.query_id, r.rank, r.vec_id, r.similarity) for r in full.collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.vec_id, r.similarity)
        for r in topk.knn_join(emb, queries, 50).collect()
    )
    assert rows == want
    # mixed regime: k=1 — the self-hit fills every bucket, so NO query
    # falls short and the fallback path must keep the pure-LSH rows
    lsh_k1 = sorted(
        (r.query_id, r.vec_id) for r in lsh.srp_topk(emb, queries, k=1, **kw).collect()
    )
    fb_k1 = sorted(
        (r.query_id, r.vec_id)
        for r in lsh.srp_topk(emb, queries, k=1, brute_fallback=True, **kw).collect()
    )
    assert fb_k1 == lsh_k1
    emb.unpersist()


def test_broadcast_verify_route_row_identical(spark):
    """The broadcast verify route must be a PURE optimization of the join
    route: row-identical output (ids and 6-dp similarities) on a wide
    corpus with degenerate rows mixed in (NULL / wrong-dim vectors are
    excluded from the broadcast matrix and score NULL, zero vectors score
    NULL via the 0-denominator — exactly the join kernel's treatment)."""
    from psy_supabase_spark.operators import lsh
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    def rows(df):
        return sorted((r.id_a, r.id_b, r.similarity) for r in df.collect())

    emb = synthetic_embeddings(spark, 1_000, 512, n_modes=100)
    degen = spark.createDataFrame(
        [(100001, None), (100002, [0.0] * 512), (100003, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(degen)
    np_, b_ = lsh.suggest_banding(1_000, 0.9, dim=512)
    kw = dict(dim=512, n_planes=np_, bands=b_)
    join_rows = rows(lsh.srp_neardup_pairs(corpus, 0.9, verify_route="join", **kw))
    bc_rows = rows(lsh.srp_neardup_pairs(corpus, 0.9, verify_route="broadcast", **kw))
    auto_rows = rows(lsh.srp_neardup_pairs(corpus, 0.9, **kw))  # auto → broadcast
    assert bc_rows == join_rows
    assert auto_rows == join_rows
    assert len(join_rows) > 0


def test_broadcast_verify_valves(spark):
    """The broadcast route's driver fetch is hard-valved: a corpus larger
    than max_broadcast_bytes raises (explicit route) or falls back to the
    join route (auto); narrow dims without the Arrow kernel refuse the
    broadcast route outright (the expression fold is the oracle-pinned
    spelling)."""
    import pytest

    from psy_supabase_spark.operators import lsh
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    emb = synthetic_embeddings(spark, 200, 512, n_modes=20)
    np_, b_ = lsh.suggest_banding(200, 0.9, dim=512)
    kw = dict(dim=512, n_planes=np_, bands=b_)

    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        lsh.srp_neardup_pairs(
            emb, 0.9, verify_route="broadcast", max_broadcast_bytes=1024, **kw
        ).count()

    # auto with a tiny valve must quietly take the join route and still
    # produce the identical answer
    auto_small = sorted(
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(
            emb, 0.9, n_rows=200, max_broadcast_bytes=1024, **kw
        ).collect()
    )
    join_rows = sorted(
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(emb, 0.9, verify_route="join", **kw).collect()
    )
    assert auto_small == join_rows

    with pytest.raises(ValueError, match="verify_route"):
        lsh.srp_neardup_pairs(emb.limit(10), 0.5, verify_route="bogus")


def test_broadcast_verify_narrow_dim_exact_fold_parity(spark):
    """r14 opt: narrow dims are broadcast-eligible via the exact-fold
    kernel, which must be BIT-identical to the narrow join route's
    Catalyst zip_with+aggregate spelling — exact equality on the 6-dp
    similarities (not approx), including a zero vector scoring NULL on
    both routes and the auto route resolving to the same rows."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.operators import lsh
    from psy_supabase_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    zero = spark.createDataFrame(
        [(900001, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    corpus = emb.unionByName(zero)
    join_rows = sorted(
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(corpus, 0.3, verify_route="join").collect()
    )
    bc_rows = sorted(
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(
            corpus, 0.3, verify_route="broadcast"
        ).collect()
    )
    auto_rows = sorted(
        (r.id_a, r.id_b, r.similarity)
        for r in lsh.srp_neardup_pairs(corpus, 0.3).collect()
    )
    assert bc_rows == join_rows  # exact equality, similarity included
    assert auto_rows == join_rows
    assert len(join_rows) > 0
    # the zero vector reached candidates but scored NULL → dropped
    assert not any(a == 900001 or b == 900001 for a, b, _ in join_rows)


def test_broadcast_verify_rejects_duplicate_ids(spark):
    """Unique-id contract: the broadcast route maps each id to ONE matrix
    row (searchsorted), while the join route scores one row per duplicate
    — so duplicated ids must raise loudly instead of silently collapsing."""
    import pytest

    from psy_supabase_spark.operators import lsh
    from psy_supabase_spark.sources.synth import synthetic_embeddings

    emb = synthetic_embeddings(spark, 100, 512, n_modes=10)
    dup = emb.unionByName(emb.limit(1))  # vec_id of row 0 appears twice
    np_, b_ = lsh.suggest_banding(101, 0.9, dim=512)
    kw = dict(dim=512, n_planes=np_, bands=b_)
    with pytest.raises(ValueError, match="duplicate"):
        lsh.srp_neardup_pairs(dup, 0.9, verify_route="broadcast", **kw).count()
    # the join route still accepts duplicated ids
    assert (
        lsh.srp_neardup_pairs(dup, 0.9, verify_route="join", **kw).count() >= 0
    )
