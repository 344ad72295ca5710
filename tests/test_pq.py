"""Product quantization: fit determinism, encode shape/compression,
ADC search recall vs exact, and full-coverage exactness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import pq, topk
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def books(emb):
    return pq.pq_fit(emb, m=8)


def test_pq_fit_shape_and_determinism(emb, books):
    assert books.m == 8 and books.dsub == 8
    assert len(books.centers) == 8
    assert all(len(c[0]) == 8 for c in books.centers)
    again = pq.pq_fit(emb, m=8)
    assert again.centers == books.centers  # seeded numpy fit is bit-stable


def test_pq_encode_codes_and_compression(spark, emb, books):
    enc = pq.pq_encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()  # every well-formed vector encodes
    assert all(len(r.codes) == 8 for r in rows)
    kmax = max(len(c) for c in books.centers)
    assert all(0 <= c < kmax for r in rows for c in r.codes)
    # deterministic encode
    again = {r.vec_id: list(r.codes) for r in pq.pq_encode(emb, books).collect()}
    assert {r.vec_id: list(r.codes) for r in rows} == again
    # malformed vectors are dropped, not encoded
    odd = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0]), (3, [0.5] * 64)],
        "vec_id long, embedding array<double>",
    )
    assert [r.vec_id for r in pq.pq_encode(odd, books).collect()] == [3]


def test_pq_search_recall_vs_exact(spark, emb, books):
    enc = pq.pq_encode(emb, books).cache()
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = pq.pq_search_batch(enc, queries, books, emb, k=10, rescore_factor=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert set(by_q) == set(range(20))
    recalls = []
    for qid in range(20):
        qvec = list(emb.where(F.col("vec_id") == qid).select("embedding").head()[0])
        exact = [r.vec_id for r in topk.topk_similarity(emb, qvec, k=10).collect()]
        recalls.append(len(set(exact) & set(by_q[qid])) / 10.0)
    mean_recall = sum(recalls) / len(recalls)
    # uniform-random vectors are PQ's worst case (no cluster structure);
    # measured ~0.8+ at m=8, k*4 rescore on this corpus
    assert mean_recall >= 0.6, recalls
    # the query's own vector must always top its list (exact rescore)
    for qid in range(20):
        assert by_q[qid][0] == qid


def test_pq_full_coverage_equals_exact(spark, emb, books):
    # rescore_factor covering the whole corpus → output IS the exact
    # top-k (the coarse pass can then only reorder survivors, and the
    # rescore is exact cosine with deterministic ties)
    n = emb.count()
    enc = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = [
        (r.vec_id, r.similarity, r.rank)
        for r in pq.pq_search_batch(
            enc, queries, books, emb, k=5, rescore_factor=(n // 5) + 1
        ).collect()
    ]
    qvec = list(emb.where(F.col("vec_id") == 7).select("embedding").head()[0])
    want = [
        (r.vec_id, r.similarity, i + 1)
        for i, r in enumerate(topk.topk_similarity(emb, qvec, k=5).collect())
    ]
    assert got == want


def test_pq_query_cap_raises(spark, emb, books):
    enc = pq.pq_encode(emb, books)
    queries = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    with pytest.raises(ValueError, match="max_queries"):
        pq.pq_search_batch(enc, queries, books, emb, k=5, max_queries=3)
    # the IVF-PQ wrapper enforces the same bound BEFORE its probe-union
    # collect (it limits to max_queries+1 rows first)
    from psy_supabase_spark.operators import ivf

    index = ivf.build_ivf(emb, n_lists=4)
    with pytest.raises(ValueError, match="max_queries"):
        pq.ivf_pq_search_batch(index, enc, queries, books, k=5, max_queries=3)


def test_adc_equals_reconstruction_dot(emb, books):
    # the ADC invariant: Σ_s LUT[q, s, code_s] must equal the dot product
    # of the unit query with the RECONSTRUCTED vector (codebook entries
    # concatenated) — exactly, since both are the same float64 sums
    import numpy as np

    cb = books.as_array()
    rows = emb.where(F.col("vec_id") < 50).select("vec_id", "embedding").collect()
    enc = {r.vec_id: list(r.codes) for r in pq.pq_encode(emb.where(F.col("vec_id") < 50), books).collect()}
    q = np.asarray(rows[0].embedding, dtype=np.float64)
    qunit = q / np.linalg.norm(q)
    lut = np.einsum("sd,skd->sk", qunit.reshape(books.m, books.dsub), cb)
    for r in rows:
        codes = enc[r.vec_id]
        adc = sum(lut[s, codes[s]] for s in range(books.m))
        recon = np.concatenate([cb[s, codes[s]] for s in range(books.m)])
        assert abs(adc - float(qunit @ recon)) < 1e-9


def test_ivf_pq_composition_prunes_and_keeps_recall(spark, emb, books, tmp_path):
    from psy_supabase_spark.operators import ivf

    index = ivf.build_ivf(emb, n_lists=8)
    # the persisted layout: (id, codes, centroid_id) partitionBy(centroid)
    # so the probe-union filter is file-level partition pruning
    path = str(tmp_path / "ivfpq")
    pq.write_ivf_pq_layout(index, books, path)
    enc = spark.read.parquet(path)
    assert set(enc.columns) == {"vec_id", "codes", "centroid_id"}
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = pq.ivf_pq_search_batch(
        index, enc, queries, books, k=10, nprobe=6, corpus=emb, rescore_factor=4
    )
    # the probe-union filter reaches the scan as file-level pruning —
    # assert centroid_id INSIDE the PartitionFilters bracket (the bare
    # substring appears even with an empty filter list)
    import re as _re

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[[^\]]*centroid_id", plan)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    assert set(by_q) == set(range(10))
    recalls = []
    for qid in range(10):
        qvec = list(emb.where(F.col("vec_id") == qid).select("embedding").head()[0])
        exact = [r.vec_id for r in topk.topk_similarity(emb, qvec, k=10).collect()]
        recalls.append(len(set(exact) & set(by_q[qid])) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.5  # pruned to 6/8 lists, uniform-random worst case
    assert all(by_q[q][0] == q for q in by_q)  # self-match survives pruning


def test_append_to_pq_layout(spark, emb, books, tmp_path):
    # incremental maintenance: codes appended with the EXISTING codebooks
    # and centroids are immediately searchable, and match what a
    # from-scratch encode of the same rows produces
    from psy_supabase_spark.operators import ivf

    old = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400)
    index = ivf.build_ivf(old, n_lists=4)
    path = str(tmp_path / "ivfpq_inc")
    pq.write_ivf_pq_layout(index, books, path)
    pq.append_to_pq_layout(new, path, index, books)
    enc = spark.read.parquet(path)
    assert enc.count() == emb.count()
    # appended codes equal a fresh encode of the same rows
    fresh = {r.vec_id: list(r.codes) for r in pq.pq_encode(new, books).collect()}
    stored = {r.vec_id: list(r.codes) for r in enc.where(F.col("vec_id") >= 400).collect()}
    assert stored == fresh
    # an appended vector is servable and self-matches at rank 1
    queries = emb.where(F.col("vec_id") == 450).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = pq.ivf_pq_search_batch(
        index, enc, queries, books, k=3, nprobe=4, corpus=emb, rescore_factor=4
    ).collect()
    assert got[0].vec_id == 450


def test_pq_rescore_arrow_parity(spark):
    """The Arrow rescore kernel must reproduce the expression rescore
    row-for-row (ids, rounded sims, ranks) at dim 64."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    books = pq.pq_fit(emb, m=8)
    enc = pq.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    rows = lambda arrow: {  # noqa: E731
        (r.query_id, r.vec_id, r.similarity, r.rank)
        for r in pq.pq_search_batch(
            enc, queries, books, emb, k=5, rescore_arrow=arrow
        ).collect()
    }
    assert rows(True) == rows(False)


def test_vectorized_probe_union_matches_rank_centroids(spark):
    """ivf_pq_search_batch's GEMM probe selection must produce the same
    probe union as per-query ivf.rank_centroids."""
    from psy_supabase_spark.operators import ivf

    emb = load_table(spark, SF, "embeddings")
    index = ivf.build_ivf(emb, n_lists=8)
    qrows = [list(r.embedding) for r in emb.where(F.col("vec_id") < 20).collect()]
    want = sorted({c for q in qrows for c in ivf.rank_centroids(index.centers, q)[:3]})

    import numpy as np

    qm = np.array(qrows, dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qu = qm / qn[:, None]
    cm = np.array(index.centers, dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1)
    cd = 1.0 - (qu @ (cm / cn[:, None]).T)
    got = sorted(
        {
            int(c)
            for qi in range(len(qrows))
            for c in np.lexsort((np.arange(len(index.centers)), cd[qi]))[:3]
        }
    )
    assert got == want


def test_pq_fit_vectors_only_fallback(emb):
    """A vectors-only frame (no id column) fits via the legacy bounded
    .limit(cap) sample instead of raising an unresolved-column error
    (ADVICE r6) — layout-dependent, but bounded and working."""
    books = pq.pq_fit(emb.select("embedding"), m=8)
    assert books.m == 8 and books.dsub == 8
    assert len(books.centers) == 8


def test_pq_search_duplicate_id_store_dedups(spark, emb, books):
    """An encoded store with repeated ids (append/union builds) must not
    yield duplicate (query, id) rows inside the final top-k (ADVICE r6:
    the dropDuplicates guard)."""
    enc = pq.pq_encode(emb, books)
    dup_store = enc.union(enc)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = pq.pq_search_batch(dup_store, queries, books, emb, k=5).collect()
    pairs = [(r.query_id, r.vec_id) for r in got]
    assert len(pairs) == len(set(pairs))
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())


# ---- residual PQ (IVF-ADC, Jégou 2011 §V) -------------------------------


@pytest.fixture(scope="module")
def rindex(emb):
    from psy_supabase_spark.operators import ivf

    return ivf.build_ivf(emb, n_lists=8)


@pytest.fixture(scope="module")
def rbooks(rindex):
    return pq.pq_fit_residual(rindex, m=8)


def test_pq_fit_residual_shape_and_determinism(rindex, rbooks):
    assert rbooks.m == 8 and rbooks.dsub == 8
    again = pq.pq_fit_residual(rindex, m=8)
    assert again.centers == rbooks.centers


def test_pq_encode_residual_schema_and_determinism(rindex, rbooks, emb):
    enc = pq.pq_encode_residual(rindex.assigned, rindex, rbooks)
    rows = enc.collect()
    assert len(rows) == emb.count()
    assert set(enc.columns) == {"vec_id", "centroid_id", "codes"}
    assert all(len(r.codes) == 8 for r in rows)
    again = {r.vec_id: (r.centroid_id, list(r.codes)) for r in
             pq.pq_encode_residual(rindex.assigned, rindex, rbooks).collect()}
    assert {r.vec_id: (r.centroid_id, list(r.codes)) for r in rows} == again


def test_pq_encode_residual_requires_centroid(emb, rindex, rbooks):
    with pytest.raises(ValueError, match="centroid_id"):
        pq.pq_encode_residual(emb, rindex, rbooks)


def test_residual_search_requires_centroid_column(spark, emb, rindex, rbooks, books):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    plain_enc = pq.pq_encode(emb, books)  # no centroid_id
    with pytest.raises(ValueError, match="centroid_id"):
        pq.pq_search_batch(
            plain_enc, queries, rbooks, emb, k=5, residual_index=rindex
        ).collect()


def test_residual_coarse_beats_plain_coarse_in_its_regime(spark):
    """The IVF-ADC claim (Jégou 2011 §V), measured in the regime where it
    holds: SCARCE code budget (m=8, k=16 → 4-bit codes) over data whose
    within-cluster noise is LOW-RANK (structured, as in natural corpora)
    — measured 0.485 vs 0.420 coarse recall@10.  The regime map, all
    measured on this engine: isotropic-noise synthetic modes → residual
    is white noise, incompressible, no win (0.4 vs 0.4; the testdata
    embeddings are that family, 0.63 vs 0.665); saturated budget (k=256)
    → both quantizers resolve the structure, tie (0.78 vs 0.795).  The
    serving guidance in the docstrings follows this map."""
    import numpy as np

    from psy_supabase_spark.operators import ivf

    rng = np.random.default_rng(11)
    n, dim, modes, rank, sigma = 1000, 64, 20, 4, 0.25
    M = rng.standard_normal((modes, dim))
    M /= np.linalg.norm(M, axis=1)[:, None]
    B = np.linalg.qr(rng.standard_normal((dim, rank)))[0]
    z = rng.standard_normal((n, rank)) * sigma
    X = M[np.arange(n) % modes] + z @ B.T
    X /= np.linalg.norm(X, axis=1)[:, None]
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).cache()
    index = ivf.build_ivf(corpus, n_lists=8)
    queries = corpus.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    exact = {}
    for r in topk.knn_join(corpus, queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(got):
        hits = tot = 0
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r.query_id, set()).add(r.vec_id)
        for q, want in exact.items():
            hits += len(by_q.get(q, set()) & want)
            tot += len(want)
        return hits / tot

    books_plain = pq.pq_fit(corpus, m=8, k=16)
    r_plain = recall(
        pq.pq_search_batch(
            pq.pq_encode(corpus, books_plain), queries, books_plain, corpus,
            k=10, rescore_factor=1,
        )
    )
    books_res = pq.pq_fit_residual(index, m=8, k=16)
    r_res = recall(
        pq.pq_search_batch(
            pq.pq_encode_residual(index.assigned, index, books_res),
            queries, books_res, corpus,
            k=10, rescore_factor=1, residual_index=index,
        )
    )
    assert r_res > r_plain, (r_res, r_plain)
    corpus.unpersist()


def test_ivf_pq_residual_end_to_end(spark, emb, rindex, rbooks, tmp_path):
    """Full-probe residual IVF-PQ with a generous rescore must return the
    exact top-k (the rescore is exact; coverage is total)."""
    path = str(tmp_path / "ivfpq_res")
    pq.write_ivf_pq_layout(rindex, rbooks, path, residual=True)
    enc = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    got = pq.ivf_pq_search_batch(
        rindex, enc, queries, rbooks, k=5, nprobe=8, rescore_factor=50, residual=True
    )
    exact = {}
    for r in topk.knn_join(emb, queries, k=5).collect():
        exact.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.similarity))
    mine = {}
    for r in got.collect():
        mine.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.similarity))
    assert {q: sorted(v) for q, v in mine.items()} == {
        q: sorted(v) for q, v in exact.items()
    }


def test_pq_layout_meta_guards_residual_mismatch(spark, emb, rindex, rbooks, tmp_path):
    path = str(tmp_path / "ivfpq_meta")
    pq.write_ivf_pq_layout(rindex, rbooks, path, residual=True)
    meta = pq.read_pq_meta(path)
    assert meta == {"residual": True, "m": 8, "dsub": 8}
    enc = spark.read.parquet(path)
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    with pytest.raises(ValueError, match="residual"):
        pq.ivf_pq_search_batch(
            rindex, enc, queries, rbooks, k=3, nprobe=8,
            residual=False, layout_path=path,
        )
    # matching mode passes the guard and serves
    got = pq.ivf_pq_search_batch(
        rindex, enc, queries, rbooks, k=3, nprobe=8,
        residual=True, layout_path=path,
    )
    assert got.count() > 0
    # sidecar-less layouts (pre-meta) stay servable
    assert pq.read_pq_meta(str(tmp_path)) is None
    # appends consult the sidecar too: wrong-mode rows would poison the
    # layout byte-indistinguishably, so the mismatch raises up front
    new = emb.where(F.col("vec_id") >= 55)
    with pytest.raises(ValueError, match="residual"):
        pq.append_to_pq_layout(new, path, rindex, rbooks, residual=False)


def test_pq_meta_hadoop_uri_paths(spark, rindex, rbooks, tmp_path):
    """The sidecar rides Spark's Hadoop path resolution: a file:/ URI
    layout (the shape any hdfs://, s3a:// layout takes) writes AND reads
    its _pq_meta.json — previously write crashed post-data and read
    silently returned None, disabling the mode guard exactly where it
    matters."""
    uri = "file:" + str(tmp_path / "ivfpq_uri")
    pq.write_ivf_pq_layout(rindex, rbooks, uri, residual=True)
    assert pq.read_pq_meta(uri) == {"residual": True, "m": 8, "dsub": 8}
    assert pq.read_pq_meta("file:" + str(tmp_path / "nowhere")) is None
