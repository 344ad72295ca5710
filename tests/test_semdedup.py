"""SemDeDup (operators/semdedup): fixed-centroid DuckDB parity,
single-cluster == exact all-pairs, the paper's keep rule, planted-dup
recall under a fitted k-means, and the cluster-cap valve."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import semdedup

DIM = 8


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _planted(n_base=20, dups_per=2, seed=7):
    """Base vectors plus tiny perturbations — every (base, perturbed)
    pair has cosine ≥ 0.99; distinct bases are near-orthogonal-ish."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = []
    groups = []
    for i, b in enumerate(base):
        g = [len(vecs)]
        vecs.append(b)
        for _ in range(dups_per):
            p = b + rng.normal(scale=0.01, size=DIM)
            g.append(len(vecs))
            vecs.append(p / np.linalg.norm(p))
        groups.append(g)
    return np.array(vecs), groups


def _brute_pairs(vecs, eps):
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round(u @ u.T, 6)
    out = set()
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            if sims[a, b] >= eps:
                out.add((a, b))
    return out


def test_single_cluster_equals_exact_all_pairs(spark):
    vecs, _ = _planted(n_base=10)
    df = _emb_df(spark, vecs)
    # one fixed centroid -> every vector lands in cluster 0 -> the pair
    # stage degenerates to the exact eps-graph
    centers = [[1.0] + [0.0] * (DIM - 1)]
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup.semdedup_pairs(df, 0.99, centers=centers).collect()
    }
    # float32 storage: compare against the float32-rounded brute force
    assert got == _brute_pairs(vecs.astype(np.float32).astype(np.float64), 0.99)


def test_fixed_centroid_assignment_and_pairs_match_duckdb(spark):
    vecs, _ = _planted(n_base=12, dups_per=1, seed=3)
    df = _emb_df(spark, vecs)
    rng = np.random.default_rng(0)
    c = rng.normal(size=(4, DIM))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    centers = [[float(x) for x in row] for row in c]

    assigned = {
        r["vec_id"]: (r["centroid_id"], r["centroid_sim"])
        for r in semdedup.assign_with_sim(df, centers).collect()
    }
    pairs = {
        (r["id_a"], r["id_b"], r["sim"], r["centroid_id"])
        for r in semdedup.semdedup_pairs(df, 0.9, centers=centers).collect()
    }

    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE emb (vec_id BIGINT, embedding DOUBLE[])")
    for i, v in enumerate(vecs.astype(np.float32)):  # parquet-faithful f32
        con.sql(f"INSERT INTO emb VALUES ({i}, {[float(x) for x in v]})")
    ctr_rows = " UNION ALL ".join(
        f"SELECT {j} AS cid, CAST({centers[j]} AS DOUBLE[]) AS cv" for j in range(4)
    )
    q = f"""
    WITH ctr AS ({ctr_rows}),
    scored AS (
      SELECT e.vec_id, c.cid,
             list_dot_product(e.embedding, c.cv) /
               (sqrt(list_dot_product(e.embedding, e.embedding)) *
                sqrt(list_dot_product(c.cv, c.cv))) AS sim
      FROM emb e CROSS JOIN ctr c
    ),
    best AS (
      SELECT vec_id, cid, ROUND(sim, 6) AS csim,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rk
      FROM scored
    ),
    asg AS (SELECT vec_id, cid, csim FROM best WHERE rk = 1)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(ea.embedding, eb.embedding) /
                 (sqrt(list_dot_product(ea.embedding, ea.embedding)) *
                  sqrt(list_dot_product(eb.embedding, eb.embedding))), 6) AS sim,
           a.cid
    FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
    JOIN emb ea ON ea.vec_id = a.vec_id JOIN emb eb ON eb.vec_id = b.vec_id
    """
    duck_pairs = {
        (int(r[0]), int(r[1]), float(r[2]), int(r[3]))
        for r in con.sql(q).fetchall()
        if float(r[2]) >= 0.9
    }
    assert pairs == duck_pairs
    duck_asg = {
        int(r[0]): (int(r[1]), float(r[2]))
        for r in con.sql(
            f"""WITH ctr AS ({ctr_rows}),
            scored AS (
              SELECT e.vec_id, c.cid,
                     list_dot_product(e.embedding, c.cv) /
                       (sqrt(list_dot_product(e.embedding, e.embedding)) *
                        sqrt(list_dot_product(c.cv, c.cv))) AS sim
              FROM emb e CROSS JOIN ctr c),
            best AS (
              SELECT vec_id, cid, ROUND(sim, 6) AS csim,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rk
              FROM scored)
            SELECT vec_id, cid, csim FROM best WHERE rk = 1"""
        ).fetchall()
    }
    assert assigned == duck_asg


def test_keep_rule_lowest_centroid_sim_wins(spark):
    # cluster around e1: three near-duplicates at increasing angle from
    # the centroid; the paper keeps the FURTHEST-from-centroid member
    e1 = np.zeros(DIM); e1[0] = 1.0
    def rot(theta):
        v = np.zeros(DIM); v[0] = math.cos(theta); v[1] = math.sin(theta)
        return v
    vecs = np.array([rot(0.00), rot(0.02), rot(0.04), -e1])  # ids 0,1,2 dups; 3 far
    df = _emb_df(spark, vecs)
    centers = [list(e1), list(-e1)]
    kept = {
        r["vec_id"]
        for r in semdedup.semdedup(df, 0.99, centers=centers).collect()
    }
    # id 2 has the lowest cosine to centroid e1 -> representative
    assert kept == {2, 3}

    flagged = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup.semdedup(df, 0.99, centers=centers, keep_flag="is_kept").collect()
    }
    assert flagged == {0: False, 1: False, 2: True, 3: True}


def test_fitted_kmeans_recall_on_planted_dups(spark):
    vecs, groups = _planted(n_base=30, dups_per=2, seed=11)
    df = _emb_df(spark, vecs)
    got = {
        (r["id_a"], r["id_b"])
        for r in semdedup.semdedup_pairs(df, 0.99, n_clusters=6, seed=42).collect()
    }
    want = _brute_pairs(vecs.astype(np.float32).astype(np.float64), 0.99)
    assert want, "planted duplicates must exist"
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"recall {recall} below floor ({len(got)} of {len(want)})"
    assert got <= want  # within-cluster pairs are exact: no false positives


def test_cluster_cap_raises(spark):
    vecs, _ = _planted(n_base=5)
    df = _emb_df(spark, vecs)
    with pytest.raises(Exception, match="cluster_cap"):
        semdedup.semdedup_pairs(
            df, 0.99, centers=[[1.0] + [0.0] * (DIM - 1)], cluster_cap=3
        ).collect()


def test_zero_vectors_never_pair(spark):
    vecs = np.array([np.zeros(DIM), np.zeros(DIM)])
    df = _emb_df(spark, vecs)
    out = semdedup.semdedup_pairs(df, 0.0, centers=[[1.0] + [0.0] * (DIM - 1)]).collect()
    assert out == []


def test_pair_stage_single_exchange(spark):
    """The pair stage's only shuffle is the groupBy(centroid_id): the
    assignment pass carries the vector, so there is no corpus re-join."""
    vecs, _ = _planted(n_base=10)
    df = _emb_df(spark, vecs)
    plan = (
        semdedup.semdedup_pairs(df, 0.99, centers=[[1.0] + [0.0] * (DIM - 1)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning\(centroid_id", plan)) == 1
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_default_n_clusters_rule():
    from psy_supabase_spark.operators.semdedup import default_n_clusters

    assert default_n_clusters(1_000) == 16          # floor
    assert default_n_clusters(100_000) == 25        # ceil(100k/4096)
    assert default_n_clusters(1_000_000_000) == 244141
    # clusters stay ~target-sized: pair GEMM bounded without the cap valve
    for n in (10_000, 10_000_000):
        k = default_n_clusters(n)
        assert n / k <= 4_096


def test_semdedup_auto_clusters(spark):
    df = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    from psy_supabase_spark.operators.semdedup import semdedup_pairs

    # n_clusters=None must fit (floor 16, clamped to n by the kmeans) and run
    assert semdedup_pairs(df, 0.99, n_clusters=None).count() >= 0


def test_string_ids_supported(spark):
    """r14 review: the pair schema hardcoded LongType ids while
    assign_with_sim preserved the corpus id type — string-keyed
    corpora crashed at Arrow conversion.  Pairs and the dedup keep
    rule now carry the corpus id type end to end."""
    rows = [
        ("url-a", [1.0, 0.0]),
        ("url-b", [1.0, 0.001]),   # near-dup of url-a
        ("url-c", [0.0, 1.0]),
    ]
    corpus = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    pairs = semdedup.semdedup_pairs(
        corpus, eps=0.99, centers=[[1.0, 0.0], [0.0, 1.0]]
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("url-a", "url-b")}
    kept = semdedup.semdedup(
        corpus, eps=0.99, centers=[[1.0, 0.0], [0.0, 1.0]]
    )
    assert {r.vec_id for r in kept.collect()} <= {"url-a", "url-b", "url-c"}
    assert "url-c" in {r.vec_id for r in kept.collect()}


def test_all_zero_fit_sample_raises_loudly(spark):
    """r14 review: an all-zero embedding sample crashed deep inside the
    k-means seeder with rng.integers(0); now a named error."""
    import pytest as _pytest

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="zero-norm"):
        semdedup.semdedup_pairs(corpus, n_clusters=2)
