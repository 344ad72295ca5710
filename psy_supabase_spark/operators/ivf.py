"""IVF (inverted-file) vector index — the Spark re-design of the
reference's pgvector ivfflat index (reference `query.txt:88-98, 208-226`:
``CREATE INDEX ... USING ivfflat (embedding vector_cosine_ops) WITH
(lists = 100)``).

There is no index object in Spark; IVF becomes a *physical layout*:
1. build: MLlib KMeans over (a sample of) the corpus → centroid table;
   every row gets a ``centroid_id``; persisted layouts are written
   ``partitionBy("centroid_id")``.
2. search: rank centroids against the query vector (driver-side — the
   centroid table is tiny; this is the planner's job, like pgvector's
   ``probes``), scan only the ``nprobe`` best partitions — Catalyst
   partition pruning turns that into file-level skipping — and run exact
   top-k within.

recall@k vs the exact scan is a measured property (tests + bench), the
same trade pgvector's lists/probes make.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V
from . import topk as topk_ops


@dataclass
class IVFIndex:
    centers: list[list[float]]  # centroid vectors, index = centroid_id
    assigned: DataFrame  # corpus + centroid_id column


def build_ivf(
    corpus: DataFrame,
    n_lists: int = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    fit_sample_fraction: float | None = None,
) -> IVFIndex:
    """KMeans(k=n_lists) on the corpus; rows tagged with their centroid.

    At 100 TB: fit on a bounded sample (KMeans driver cost is O(k·dim) per
    iter), then assignment is a single broadcast map over the corpus —
    which is exactly what this does; only ``.fit`` sees the sampled data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # spherical-KMeans approximation: cluster UNIT vectors so euclidean
    # assignment ≈ cosine ranking (zero vectors fall back to the raw array);
    # without this, centroid geometry and the cosine query metric disagree
    # and recall craters on high-dim data.
    unit = V.normalize(vec_col)
    vecs = corpus.select(
        id_col,
        array_to_vector(
            F.coalesce(unit, F.col(vec_col).cast("array<double>")).cast("array<double>")
        ).alias("features"),
    ).cache()
    fit_input = vecs.sample(fit_sample_fraction, seed=seed) if fit_sample_fraction else vecs
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(fit_input)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = (
        model.transform(vecs)
        .select(id_col, F.col("prediction").alias("centroid_id"))
        .join(corpus, id_col)
    )
    return IVFIndex(centers=centers, assigned=assigned)


def rank_centroids(centers: list[list[float]], query_vec: list[float]) -> list[int]:
    """Centroid ids ordered by ascending cosine distance to the query —
    pure driver-side math over the (tiny) centroid table."""

    def cos_dist(c: list[float]) -> float:
        dot = sum(a * b for a, b in zip(c, query_vec))
        nc = math.sqrt(sum(a * a for a in c))
        nq = math.sqrt(sum(b * b for b in query_vec))
        return 1.0 - (dot / (nc * nq)) if nc > 0 and nq > 0 else float("inf")

    return sorted(range(len(centers)), key=lambda i: (cos_dist(centers[i]), i))


def ivf_search(
    index: IVFIndex,
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: scan only the nprobe closest centroid partitions.

    The ``centroid_id.isin(...)`` filter is exactly what prunes parquet
    partitions when the layout is written partitionBy("centroid_id") —
    pgvector's probes, re-expressed as partition pruning.
    """
    probe_ids = rank_centroids(index.centers, query_vec)[:nprobe]
    pruned = index.assigned.where(F.col("centroid_id").isin(probe_ids))
    return topk_ops.topk_similarity(pruned, query_vec, k=k, id_col=id_col, embedding_col=vec_col)


def write_ivf_layout(index: IVFIndex, path: str) -> None:
    """Persist the IVF physical layout: parquet partitioned by centroid_id
    (one directory per list — the moral equivalent of pgvector's inverted
    lists, readable with partition pruning)."""
    index.assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def search_layout(
    spark,
    path: str,
    centers: list[list[float]],
    query_vec: list[float],
    k: int = 5,
    nprobe: int = 4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted layout; the isin filter prunes at file level
    (verify with .explain → PartitionFilters)."""
    probe_ids = rank_centroids(centers, query_vec)[:nprobe]
    df = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    return topk_ops.topk_similarity(df, query_vec, k=k, id_col=id_col, embedding_col=vec_col)


def recall_at_k(exact_ids: list[int], approx_ids: list[int], k: int) -> float:
    return len(set(exact_ids[:k]) & set(approx_ids[:k])) / float(k)
