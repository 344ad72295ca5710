"""SemDeDup — semantic (embedding-space) deduplication via clustering.

Abbas 2023 ("SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540): exact/near-text dedup misses
*semantic* duplicates — same content, different words (reposts,
translations-of-boilerplate, templated rewrites).  SemDeDup finds them
in embedding space without an all-pairs scan:

1. k-means-cluster the embeddings (k chosen so clusters are small);
2. compute pairwise cosine only WITHIN each cluster;
3. among mutual duplicates (pairs with cosine ≥ eps), keep ONE item per
   duplicate group — the paper keeps the item with the LOWEST cosine to
   its cluster centroid (cluster-edge items preserve coverage).

Spark-first shape:

- Clustering reuses :mod:`operators.ivf`'s spherical k-means (bounded
  driver fit, seeded) — SemDeDup IS an IVF layout read for dedup instead
  of serving.
- Assignment + centroid similarity is ONE Arrow-batched ``mapInPandas``
  GEMM pass (broadcast centroid matrix).
- Within-cluster pairs: ``applyInPandas`` per centroid_id — a single
  (n×d)·(d×n) GEMM per cluster, emitting only pairs ≥ eps.  The shuffle
  key is centroid_id; per-task memory is bounded by ``cluster_cap``
  (oversized clusters fail loudly with "raise n_clusters" guidance —
  the knob that bounds them by design, exactly as the paper scales k
  with corpus size).
- Duplicate groups = connected components over the eps-graph
  (:func:`operators.dedup.connected_components`, O(log d) rounds);
  the keep rule is one window min per component.

The pair stage is exact within a cluster; cross-cluster duplicates are
the recall tradeoff the paper accepts (two near-identical vectors
landing in different clusters is rare — both sit near the same
centroid).  Recall vs the exact eps-graph is measured in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .dedup import connected_components

DEFAULT_EPS = 0.95  # paper sweeps 0.95-0.999 for web data
TARGET_CLUSTER_ROWS = 4_096  # auto n_clusters aims here (pair GEMM ~16M cells)


def default_n_clusters(n_rows: int, *, target: int = TARGET_CLUSTER_ROWS) -> int:
    """Self-tuning cluster count: ``max(16, ceil(N / target))`` — the
    paper scales k with corpus size so clusters stay ~10³-10⁵ rows; this
    rule keeps the within-cluster pair GEMM ~target² cells and makes the
    `cluster_cap` valve a backstop instead of the primary control.
    Mirrors `ivf.default_n_lists` (round-6 self-tuning rule family)."""
    return max(16, -(-max(int(n_rows), 1) // target))


def _fit_centers(
    corpus: DataFrame, n_clusters: int, seed: int, vec_col: str, id_col: str = "vec_id"
) -> list[list[float]]:
    """Seeded spherical-k-means centroids from a bounded driver sample
    (the :func:`operators.ivf.build_ivf` fit, shared) — hash-ordered via
    `ivf.fit_sample_vectors`, so cluster balance survives domain-sorted
    input layouts."""
    import numpy as np

    from . import ivf

    sample = ivf.fit_sample_vectors(
        corpus, ivf.FIT_SAMPLE_CAP, id_col=id_col, vec_col=vec_col
    )
    x = np.array([r[0] for r in sample], dtype=np.float64)
    if x.size == 0:
        raise ValueError("semdedup: empty corpus")
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    if x.size == 0:
        # every sampled vector was zero-norm (a failed upstream
        # embedding job writing zeros): say so, instead of the opaque
        # rng.integers(0) crash inside the k-means seeder (r14 review)
        raise ValueError(
            "semdedup: fit sample contains only zero-norm vectors — "
            "cosine geometry is undefined; check the embedding column"
        )
    return [list(map(float, c)) for c in ivf._spherical_kmeans(x, n_clusters, seed, 8)]


def assign_with_sim(
    corpus: DataFrame,
    centers: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, centroid_sim): nearest centroid by cosine plus
    the similarity itself (the keep rule needs it) — one Arrow-batched
    GEMM pass, the :func:`operators.ivf.assign_to_centroids` shape with
    the max carried alongside the argmax.  Zero vectors pin to centroid
    0 with sim 0."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    ct = np.array(centers, dtype=np.float64).T.copy()
    out_schema = StructType(
        [
            corpus.schema[id_col],
            StructField("centroid_id", IntegerType(), False),
            StructField("centroid_sim", DoubleType(), False),
        ]
    )

    def assign(batches):
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            zero = nrm == 0
            nrm[zero] = 1.0
            sims = (m / nrm[:, None]) @ ct
            best = sims.argmax(axis=1)
            best_sim = np.round(sims[np.arange(len(best)), best], 6)
            best_sim[zero] = 0.0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "centroid_id": best.astype("int32"),
                    "centroid_sim": best_sim,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema=out_schema)


def semdedup_pairs(
    corpus: DataFrame,
    eps: float = DEFAULT_EPS,
    *,
    n_clusters: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cluster_cap: int = 100_000,
    centers: list[list[float]] | None = None,
) -> DataFrame:
    """(id_a, id_b, sim, centroid_id) — within-cluster pairs with cosine
    ≥ ``eps`` (id_a < id_b, sim rounded to 6 dp).  ``centers`` overrides
    the fitted centroids (deterministic-oracle mode, the
    ``ann_pruned_topk_fixed_centroids`` pattern).  ``n_clusters=None``
    self-tunes via :func:`default_n_clusters` (one count job)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if centers is None:
        if n_clusters is None:
            n_clusters = default_n_clusters(corpus.count())
        centers = _fit_centers(corpus, n_clusters, seed, vec_col, id_col)

    # assignment CARRIES the vector through the Arrow pass instead of
    # re-joining the corpus on id: the only exchange in the pair stage is
    # the groupBy(centroid_id) — plan-asserted in tests
    ct = np.array(centers, dtype=np.float64).T.copy()
    asg_schema = StructType(
        [
            corpus.schema[id_col],
            corpus.schema[vec_col],
            StructField("centroid_id", IntegerType(), False),
        ]
    )

    def assign_carry(batches):
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0
            sims = (m / nrm[:, None]) @ ct
            out = pdf[[id_col, vec_col]].copy()
            out["centroid_id"] = sims.argmax(axis=1).astype("int32")
            yield out

    assigned = corpus.select(id_col, vec_col).mapInPandas(assign_carry, schema=asg_schema)

    # id columns keep the CORPUS id type (r14 review: a hardcoded
    # LongType broke string-keyed corpora at Arrow conversion, while
    # assign_with_sim above deliberately preserves corpus.schema[id_col])
    id_type = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_type, False),
            StructField("id_b", id_type, False),
            StructField("sim", DoubleType(), False),
            StructField("centroid_id", IntegerType(), False),
        ]
    )
    cap = cluster_cap

    def pairs_in_cluster(key, pdf):
        n = len(pdf)
        if n > cap:
            raise ValueError(
                f"semdedup cluster {key[0]} has {n} > cluster_cap={cap} rows; "
                "raise n_clusters (the paper scales k with corpus size) or cluster_cap"
            )
        if n < 2:
            empty_ids = pdf[id_col].iloc[:0]  # exact dtype of the real ids
            return pd.DataFrame(
                {
                    "id_a": empty_ids,
                    "id_b": empty_ids,
                    "sim": pd.Series([], dtype="float64"),
                    "centroid_id": pd.Series([], dtype="int32"),
                }
            )
        ids = pdf[id_col].to_numpy()
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nz = nrm > 0
        nrm[~nz] = 1.0
        u = m / nrm[:, None]
        # BLOCKED pair GEMM: a full n×n sims matrix (plus triu index
        # arrays) is O(n²) memory — 80 GB at the 100k cap.  Row blocks
        # of ~10M cells keep the working set ~80 MB at ANY n; time stays
        # the same O(n²d) the cap already bounds.
        block = max(1, 10_000_000 // n)
        la, lb, ls = [], [], []
        for s in range(0, n, block):
            e = min(s + block, n)
            sims = np.round(u[s:e] @ u.T, 6)
            cols = np.arange(n)[None, :]
            rows = np.arange(s, e)[:, None]
            keep = (sims >= eps) & (cols > rows) & nz[None, :] & nz[s:e][:, None]
            bi, bj = np.nonzero(keep)
            la.append(bi + s)
            lb.append(bj)
            ls.append(sims[bi, bj])
        ia = np.concatenate(la)
        ib = np.concatenate(lb)
        sv = np.concatenate(ls)
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pd.DataFrame(
            {
                "id_a": lo,
                "id_b": hi,
                "sim": sv,
                "centroid_id": np.full(len(lo), key[0], dtype="int32"),
            }
        )

    return (
        assigned.groupBy("centroid_id")
        .applyInPandas(pairs_in_cluster, schema=out_schema)
    )


def semdedup(
    corpus: DataFrame,
    eps: float = DEFAULT_EPS,
    *,
    n_clusters: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    cluster_cap: int = 100_000,
    centers: list[list[float]] | None = None,
    keep_flag: str | None = None,
) -> DataFrame:
    """Corpus with semantic duplicates removed (or flagged when
    ``keep_flag`` names a boolean column).

    Duplicate groups are connected components of the eps-graph; each
    group keeps the member with the LOWEST centroid similarity (the
    paper's coverage-preserving rule), ties broken by id.  Everything
    outside any group is kept.
    """
    if centers is None:
        # fit once here so pairs and the keep rule see the SAME centroids
        if n_clusters is None:
            n_clusters = default_n_clusters(corpus.count())
        centers = _fit_centers(corpus, n_clusters, seed, vec_col, id_col)

    pairs = semdedup_pairs(
        corpus,
        eps,
        id_col=id_col,
        vec_col=vec_col,
        cluster_cap=cluster_cap,
        centers=centers,
    )
    comps = connected_components(pairs)
    # the keep rule needs centroid_sim ONLY for component members (the
    # duplicate set is small relative to the corpus): prune the second
    # GEMM pass to them instead of re-scoring everything
    member_vecs = corpus.join(
        comps.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )
    sims = assign_with_sim(member_vecs, centers, id_col=id_col, vec_col=vec_col)
    members = comps.join(
        sims.select(F.col(id_col).alias("id"), "centroid_sim"), "id"
    )
    w = Window.partitionBy("component").orderBy(F.col("centroid_sim").asc(), F.col("id").asc())
    reps = (
        members.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(F.col("id").alias("_keep_id"))
    )
    dropped = (
        comps.join(reps, comps.id == F.col("_keep_id"), "left_anti")
        .select(F.col("id").alias(id_col))
    )
    if keep_flag is not None:
        return corpus.join(
            dropped.withColumn("_dropped", F.lit(True)), id_col, "left"
        ).withColumn(keep_flag, F.col("_dropped").isNull()).drop("_dropped")
    return corpus.join(dropped, id_col, "left_anti")
