"""Deterministic hash-ordered fit sampling (ivf.fit_sample_vectors) and
the auto n_lists rule (ivf.default_n_lists).

The round-5 verdict's #2 risk: `.limit(cap)` takes the FIRST partitions,
so on a corpus sorted by domain/topic (how crawl data arrives) the
k-means fit sample covers one mode and centroids skew.  The fix orders
by xxhash64(id) — a pure function of the ids — before the limit."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from psy_supabase_spark.operators import ivf, pq, semdedup


def _clustered_df(spark, n=1000, dim=8, n_modes=2, seed=7):
    """n rows in n_modes well-separated cosine modes, SORTED by mode —
    the adversarial layout (first partitions hold only mode 0)."""
    rng = np.random.default_rng(seed)
    modes = rng.standard_normal((n_modes, dim))
    modes /= np.linalg.norm(modes, axis=1)[:, None]
    rows = []
    per = n // n_modes
    for mode_i in range(n_modes):
        for j in range(per):
            v = modes[mode_i] + 0.05 * rng.standard_normal(dim)
            rows.append((mode_i * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # force the sorted layout into the physical plan: range-partition by id
    return df.repartitionByRange(4, "vec_id")


def test_fit_sample_is_layout_independent(spark):
    df = _clustered_df(spark)
    a = ivf.fit_sample_vectors(df, 300, id_col="vec_id", vec_col="embedding")
    b = ivf.fit_sample_vectors(
        df.repartition(13), 300, id_col="vec_id", vec_col="embedding"
    )
    c = ivf.fit_sample_vectors(
        df.orderBy(F.col("vec_id").desc()), 300, id_col="vec_id", vec_col="embedding"
    )
    assert [r[0] for r in a] == [r[0] for r in b] == [r[0] for r in c]


def test_fit_sample_covers_sorted_corpus_modes(spark):
    """cap = half the corpus on a mode-sorted layout: a bare limit() would
    return only mode-0 rows; the hash-ordered sample must cover both."""
    df = _clustered_df(spark, n=1000, n_modes=2)
    sample = ivf.fit_sample_vectors(df, 500, id_col="vec_id", vec_col="embedding")
    # recover mode membership via similarity to the two planted modes
    x = np.array([list(r[0]) for r in sample])
    x /= np.linalg.norm(x, axis=1)[:, None]
    rng = np.random.default_rng(7)
    modes = rng.standard_normal((2, 8))
    modes /= np.linalg.norm(modes, axis=1)[:, None]
    assign = (x @ modes.T).argmax(axis=1)
    frac_mode1 = float((assign == 1).mean())
    assert 0.3 < frac_mode1 < 0.7  # ~half from each mode, not 0


def test_build_ivf_centers_identical_under_repartitioning(spark):
    df = _clustered_df(spark)
    c1 = ivf.build_ivf(df, n_lists=2, fit_sample_cap=400).centers
    c2 = ivf.build_ivf(df.repartition(17), n_lists=2, fit_sample_cap=400).centers
    assert c1 == c2


def test_build_ivf_sorted_corpus_finds_both_modes(spark):
    """With cap < |corpus| on the sorted layout, both fitted centroids
    must land in DIFFERENT modes (limit-sampling would put both inside
    mode 0: any two unit vectors in one 0.05-noise mode have cosine
    > 0.99)."""
    df = _clustered_df(spark, n=1000, n_modes=2)
    centers = np.array(ivf.build_ivf(df, n_lists=2, fit_sample_cap=500).centers)
    cos = float(centers[0] @ centers[1])
    assert cos < 0.5, f"centroids collapsed into one mode (cos={cos})"


def test_ivf_recall_unaffected_by_sorted_layout(spark):
    """End-to-end: recall@5 for a mode-1 query must not degrade when the
    corpus arrives mode-sorted vs shuffled — same centers ⇒ same index."""
    from psy_supabase_spark.operators import topk

    df = _clustered_df(spark, n=1000, n_modes=2)
    qvec = [float(x) for x in df.where(F.col("vec_id") == 999).head()[1]]
    exact = [r[0] for r in topk.topk_similarity(df, qvec, k=5).collect()]

    sorted_idx = ivf.build_ivf(df, n_lists=2, fit_sample_cap=500)
    shuffled_idx = ivf.build_ivf(df.repartition(11), n_lists=2, fit_sample_cap=500)
    for idx in (sorted_idx, shuffled_idx):
        got = [r[0] for r in ivf.ivf_search(idx, qvec, k=5, nprobe=1).collect()]
        assert ivf.recall_at_k(exact, got, 5) == 1.0


def test_pq_fit_layout_independent(spark):
    df = _clustered_df(spark, n=400, dim=8)
    b1 = pq.pq_fit(df, m=2, k=8, fit_sample_cap=200)
    b2 = pq.pq_fit(df.repartition(9), m=2, k=8, fit_sample_cap=200)
    assert b1.centers == b2.centers


def test_semdedup_fit_layout_independent(spark):
    df = _clustered_df(spark, n=400, dim=8)
    c1 = semdedup._fit_centers(df, 2, 42, "embedding")
    c2 = semdedup._fit_centers(df.repartition(9), 2, 42, "embedding")
    assert c1 == c2


# ---- auto n_lists rule ----


def test_default_n_lists_sqrt_scaling():
    a = ivf.default_n_lists(10_000, 64)
    b = ivf.default_n_lists(100_000, 64)
    assert a == 100 and b == 316  # 10× rows → ~3.16× lists


def test_default_n_lists_size_floor():
    # 1B rows at dim 1536: √N governs and per-list bytes stay under 1 GB
    n, dim = 1_000_000_000, 1536
    lists = ivf.default_n_lists(n, dim)
    assert n * (4 * dim + 16) <= lists * (1 << 30)
    # a big-and-wide corpus where the SIZE floor must override √N
    # (√1e8 = 10k lists would put ~4 GB in each list at 400 KB/row)
    n2, dim2 = 100_000_000, 100_000
    lists2 = ivf.default_n_lists(n2, dim2)
    assert lists2 > 10_000
    assert n2 * (4 * dim2 + 16) <= lists2 * (1 << 30)


def test_default_n_lists_bounds():
    assert ivf.default_n_lists(1, 64) == 1
    assert ivf.default_n_lists(10, 64) == 4  # min_lists
    assert ivf.default_n_lists(3, 64) == 3  # never exceeds n
    assert ivf.default_n_lists(10**13, 64) == 65_536  # max clamp


def test_build_ivf_auto_lists(spark):
    df = _clustered_df(spark, n=1000)
    idx = ivf.build_ivf(df, n_lists=None, fit_sample_cap=400)
    assert len(idx.centers) == ivf.default_n_lists(1000, 8) == 31
