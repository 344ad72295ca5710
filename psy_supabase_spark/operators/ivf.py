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


FIT_SAMPLE_CAP = 100_000  # rows collected to the driver for the fit

# auto n_lists rule (SCALE.md): per-list partitions should stay under
# ~1 GB so a probed list is one comfortable task read
TARGET_LIST_BYTES = 1 << 30


def default_n_lists(
    n_rows: int,
    dim: int,
    *,
    target_list_bytes: int = TARGET_LIST_BYTES,
    min_lists: int = 4,
    max_lists: int = 65_536,
) -> int:
    """Self-tuning lists count: ``max(√N, size-floor)`` clamped.

    √N is the classical IVF balance point (per-list scan cost ≈ probe
    cost; FAISS's guideline) — at 10× corpus it grows ~3.2×, keeping
    per-list row counts ~3.2× instead of 10×.  The size floor guarantees
    a probed list never exceeds ``target_list_bytes`` on disk (float32
    payload + per-row overhead estimate), the ≤1 GB-per-partition target
    SCALE.md sets — whichever demands MORE lists wins."""
    n = max(int(n_rows), 1)
    bytes_per_row = 4 * dim + 16
    by_sqrt = math.isqrt(n)
    by_size = -(-n * bytes_per_row // target_list_bytes)  # ceil div
    return max(min(max(by_sqrt, by_size), max_lists, n), min(min_lists, n), 1)


def fit_sample_vectors(
    vecs: DataFrame, cap: int, *, id_col: str, vec_col: str
) -> "list":
    """Collect ≤``cap`` vectors for a driver-side model fit,
    deterministically and WITHOUT input-layout bias.

    Rows are taken in ``xxhash64(id)`` order — a fixed pseudo-random
    global order that is a pure function of the ids, so the sample is
    (a) identical under any repartitioning / file ordering (a bare
    ``.limit(cap)`` takes whatever partitions the scheduler lists first)
    and (b) distribution-covering on sorted/clustered corpora: crawl data
    arrives sorted by domain/topic, and a first-partitions sample would
    fit every centroid inside one mode (the round-5 verdict's #2 risk).
    TWO-PHASE so no executor ever heaps WIDE rows: phase 1 takes the
    top-``cap`` ids by hash over the id column alone (parquet column
    pruning makes this a narrow scan; TakeOrderedAndProject heaps are
    ~16 B/row — a single-phase TakeOrdered over the vectors would hold
    cap × dim bytes per task, ~600 MB at dim 1536/cap 100k).  Phase 2
    broadcast-semi-joins the ≤cap ids back to fetch their vectors and
    re-sorts the bounded result so the collected ORDER (which seeds
    k-means++) is a pure function of the ids too.
    xxhash64 (not the engine's portable md5 bucketing,
    operators/sampling.md5_hash32) because a fit sample needs no
    cross-engine mirror — only layout independence — and the JVM-native
    hash is far cheaper at corpus scale."""
    order = [F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc()]
    ids = vecs.select(id_col).orderBy(*order).limit(cap)
    return (
        vecs.join(F.broadcast(ids), id_col, "left_semi")
        .orderBy(*order)
        .select(vec_col)
        .collect()
    )


def _spherical_kmeans(x, k: int, seed: int, max_iter: int):
    """k-means++ seeded Lloyd iterations on UNIT vectors (cosine geometry;
    centroids re-normalized each step).  Pure numpy on the driver — the
    model is k×dim floats, the fit set a bounded sample; there is nothing
    to distribute (MLlib KMeans on the same input spends seconds of
    per-iteration job scheduling to do this exact arithmetic)."""
    import numpy as np

    n = x.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    centers = np.empty((k, x.shape[1]), dtype=np.float64)
    centers[0] = x[int(rng.integers(n))]
    d = np.maximum(1.0 - x @ centers[0], 0.0)
    for j in range(1, k):
        tot = d.sum()
        probs = d / tot if tot > 0 else np.full(n, 1.0 / n)
        centers[j] = x[int(rng.choice(n, p=probs))]
        d = np.minimum(d, np.maximum(1.0 - x @ centers[j], 0.0))
    for _ in range(max_iter):
        assign = (x @ centers.T).argmax(axis=1)
        prev = centers.copy()
        for j in range(k):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                nrm = float(np.linalg.norm(c))
                if nrm > 0:
                    centers[j] = c / nrm
        if np.allclose(centers, prev):
            break
    return centers


def build_ivf(
    corpus: DataFrame,
    n_lists: int | None = 16,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
    fit_sample_fraction: float | None = None,
    fit_sample_cap: int = FIT_SAMPLE_CAP,
) -> IVFIndex:
    """Spherical KMeans(k=n_lists) fit on a bounded sample; every corpus
    row tagged with its nearest centroid by an Arrow-batched matmul.

    ``n_lists=None`` self-tunes via :func:`default_n_lists` (≈√N with a
    ≤1 GB-per-list floor) at the cost of one count job — build-time work,
    amortized like the fit itself.  The fit sample is hash-ordered
    (:func:`fit_sample_vectors`), so centroids are identical under any
    input partitioning and cover the full corpus distribution even when
    the corpus arrives sorted by domain/topic.

    At 100 TB the fit NEVER needs the cluster: the model is k×dim floats
    and the fit input a ≤``fit_sample_cap``-row sample, so it runs as
    driver-side numpy (pgvector's ivfflat build samples the same way).
    Assignment is the distributed half — one ``mapInPandas`` pass over the
    corpus, each Arrow batch scored against the broadcast centroid matrix
    with a single (batch×dim)·(dim×k) matmul.
    """
    import numpy as np

    vecs = corpus.select(id_col, vec_col)
    fit_df = vecs.sample(fit_sample_fraction, seed=seed) if fit_sample_fraction else vecs
    if n_lists is None:
        head = fit_df.select(vec_col).where(F.col(vec_col).isNotNull()).head()
        if head is None:
            raise ValueError("build_ivf: empty corpus")
        n_lists = default_n_lists(vecs.count(), len(head[0]))
    # k-means needs ~tens of points per centroid, not the whole corpus
    # (FAISS guidance: 30-256 training points per list) — capping the
    # collected sample at 64·k (floor 10k, never above the caller's cap)
    # keeps the driver fetch O(k·dim) instead of O(cap·dim): the 100k-row
    # dim-1536 scale-step build spent most of its 59 s collecting a 1.2 GB
    # sample to fit 316 centroids that ~20k points determine just as well
    eff_cap = min(fit_sample_cap, max(10_000, 64 * n_lists))
    sample = fit_sample_vectors(fit_df, eff_cap, id_col=id_col, vec_col=vec_col)
    x = np.array([r[0] for r in sample], dtype=np.float64)
    if x.size == 0:
        raise ValueError("build_ivf: empty corpus")
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    centers_np = _spherical_kmeans(x, n_lists, seed, max_iter)
    centers = [list(map(float, c)) for c in centers_np]

    assigned = assign_to_centroids(corpus, centers, id_col=id_col, vec_col=vec_col)
    return IVFIndex(centers=centers, assigned=assigned)


def assign_to_centroids(
    corpus: DataFrame,
    centers: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag every row with its nearest centroid (max cosine): one
    ``mapInPandas`` pass, each Arrow batch scored against the broadcast
    centroid matrix with a single (batch×dim)·(dim×k) matmul.  The
    distributed half of both the initial build AND incremental appends."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    ct = np.array(centers, dtype=np.float64).T.copy()  # dim×k, in the closure once
    out_schema = StructType(
        [corpus.schema[id_col], StructField("centroid_id", IntegerType(), False)]
    )

    def assign(batches):
        for pdf in batches:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0] = 1.0  # zero vectors → all-zero sims → centroid 0
            sims = (m / nrm[:, None]) @ ct
            yield pd.DataFrame(
                {id_col: pdf[id_col], "centroid_id": sims.argmax(axis=1).astype("int32")}
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema=out_schema).join(
        corpus, id_col
    )


_BUILD_MEMO: dict[tuple[int, str, int], IVFIndex] = {}


def build_ivf_cached(corpus: DataFrame, source_key: str, n_lists: int = 16, **kw) -> IVFIndex:
    """Process-lifetime memo of ``build_ivf`` keyed by (session, source, k).

    An index is build-once/search-many (the reference instead re-created its
    ivfflat index per request, `main.py:57` — its own documented mistake);
    callers over immutable sources (the testdata tables) share one build per
    session.  Mutable callers (api.TenantStore) must invalidate on write.
    """
    key = (id(corpus.sparkSession), source_key, n_lists)
    if key not in _BUILD_MEMO:
        idx = build_ivf(corpus, n_lists=n_lists, **kw)
        idx.assigned = idx.assigned.cache()
        _BUILD_MEMO[key] = idx
    return _BUILD_MEMO[key]


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


def write_ivf_layout(index: IVFIndex, path: str, *, vec_col: str = "embedding") -> None:
    """Persist the IVF physical layout: parquet partitioned by centroid_id
    (one directory per list — the moral equivalent of pgvector's inverted
    lists, readable with partition pruning).  The row norm is precomputed
    into ``_vnorm`` at write time — norms are index-BUILD work, so serving
    scores with ONE fold per row instead of three (the SQ8 store keeps its
    coarse norm for the same reason)."""
    index.assigned.withColumn("_vnorm", V.l2_norm(vec_col)).write.mode(
        "overwrite"
    ).partitionBy("centroid_id").parquet(path)


QUANTIZE_ARROW_DIM = 256  # above this width the Arrow path wins (see below)
# historical auto-route threshold, kept for callers that assert the route
# is engaged; since r7 the batch entrypoint routes GEMM at EVERY size —
# measured sf0.1 batch-100: 8 lists×dim 64 = 4.4 s expression vs 0.5 s
# GEMM, 44 lists = 5.7 s vs 0.3 s — because the per-(row, query) HOF fold
# dominates regardless of the probe-literal count
GEMM_ROUTE_CELLS = 4096


def quantized_store(
    index: IVFIndex,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool | None = None,
) -> DataFrame:
    """The IVF-SQ8 storage form: (id, centroid_id, int8 payload, coarse
    norm).  72 B/row vs 256 B for float32 dim-64 — what a billion-vector
    serving tier keeps hot.  ``_qnorm`` is ‖q‖ of the INT array: cosine is
    scale-invariant, so the coarse pass scores raw ints against the query
    with one fold and no dequantization.

    ``arrow`` switches the quantize kernel: the default (None) picks the
    codegen HOF expression below ``QUANTIZE_ARROW_DIM`` and an
    Arrow-batched numpy pass above it.  The expression spelling is three
    interpreted per-element folds per row — the right trade at dim 64
    (no Python boundary), but measured 267 s for a 20k-row dim-1536
    store vs ~2 s for the numpy pass (the round-6 width validation's
    second finding, after the probe-literal plan).  Outputs are
    row-identical (HALF_UP rounding reproduced in numpy; parity pinned
    in tests)."""
    dim = len(index.centers[0]) if index.centers else 0
    if arrow is None:
        arrow = dim >= QUANTIZE_ARROW_DIM
    if not arrow:
        base = index.assigned.select(
            id_col, "centroid_id", V.quantize_int8(vec_col).alias("_qs")
        )
        return base.withColumn("_qnorm", V.l2_norm(F.col("_qs.q")))

    import numpy as np
    import pandas as pd

    id_t = index.assigned.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_t}, centroid_id int, "
        "_qs struct<scale: double, q: array<tinyint>>, _qnorm double"
    )

    def quant(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            # same ok-mask as pq_encode / the GEMM scorer: NULL or
            # wrong-dim rows are unservable — skip them instead of
            # letting np.stack crash the task (the expression kernel
            # NULLs them; every scoring path drops NULLs, so counts of
            # SERVABLE rows agree)
            vals = pdf[vec_col].tolist()
            ok = np.fromiter(
                (v is not None and len(v) == dim for v in vals),
                dtype=bool,
                count=len(vals),
            )
            if not ok.any():
                continue
            rows = np.flatnonzero(ok)
            m = np.stack([np.asarray(vals[i], dtype=np.float64) for i in rows])
            amax = np.abs(m).max(axis=1)
            scale = np.where(amax == 0.0, 1.0, amax / 127.0)
            r = m / scale[:, None]
            # HALF_UP like F.round (np.round is half-even): away-from-zero
            q = (np.floor(np.abs(r) + 0.5) * np.sign(r)).astype(np.int8)
            qn = np.sqrt((q.astype(np.float64) ** 2).sum(axis=1))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[rows],
                    "centroid_id": pdf["centroid_id"].to_numpy()[rows].astype("int32"),
                    "_qs": [
                        {"scale": float(s), "q": row} for s, row in zip(scale, q)
                    ],
                    "_qnorm": qn,
                }
            )

    return index.assigned.select(id_col, "centroid_id", vec_col).mapInPandas(
        quant, schema=schema
    )


def write_ivf_sq8_layout(
    index: IVFIndex, path: str, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> None:
    """Persist the SQ8 store partitioned by centroid_id — quantization is
    index-BUILD-time work; serving must never pay it per query."""
    quantized_store(index, id_col=id_col, vec_col=vec_col).write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(path)


def append_to_layout(
    new_rows: DataFrame,
    path: str,
    centers: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign new vectors to the EXISTING
    centroids and append into their partitions — no KMeans refit, no
    layout rewrite; searches see the new vectors immediately (exact scan
    within probed lists).

    This is how pgvector's ivfflat behaves on INSERT too: rows join the
    nearest existing list and the centroids drift from the true data
    distribution.  Recall degrades gradually as appended mass grows;
    rebuild (``build_ivf`` + ``write_ivf_layout``) once appends exceed
    ~30-50% of the indexed volume — at which point the old layout swap is
    atomic if the path is a ``sources/txlog.TxTable`` overwrite."""
    assigned = assign_to_centroids(new_rows, centers, id_col=id_col, vec_col=vec_col)
    assigned.withColumn("_vnorm", V.l2_norm(vec_col)).write.mode("append").partitionBy(
        "centroid_id"
    ).parquet(path)


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
    (verify with .explain → PartitionFilters).

    Layouts written by :func:`write_ivf_layout` carry a precomputed
    ``_vnorm`` column: scoring then costs one fold per row — the query
    norm is a driver-side Python float (IEEE-754 like the JVM's, same
    left-to-right accumulation order, so similarities are bit-identical
    to the inline spelling — parity-asserted in tests).  Layouts without
    the column (pre-r5) fall back to the three-fold inline cosine, and a
    MIXED layout (pre-r5 files + post-r5 appends) is handled per row:
    legacy rows read ``_vnorm`` as NULL, which coalesces to the inline
    norm instead of silently NULLing the row out of the top-k."""
    import math

    probe_ids = rank_centroids(centers, query_vec)[:nprobe]
    df = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    if "_vnorm" in df.columns:
        # left-to-right accumulation, matching F.aggregate's fold order
        qn = math.sqrt(sum((float(x) * float(x) for x in query_vec), 0.0))
        q = V.query_vector_lit(query_vec)
        nrm = F.coalesce(F.col("_vnorm"), V.l2_norm(vec_col))
        sim = F.when(
            (nrm == 0.0) | (F.lit(qn) == 0.0), F.lit(None).cast("double")
        ).otherwise(V.round6(V.dot(F.col(vec_col), q) / (nrm * F.lit(qn))))
        return (
            df.select(id_col, sim.alias("similarity"))
            .where(F.col("similarity").isNotNull())
            .orderBy(F.col("similarity").desc(), F.col(id_col).asc())
            .limit(k)
        )
    return topk_ops.topk_similarity(df, query_vec, k=k, id_col=id_col, embedding_col=vec_col)


def recall_at_k(exact_ids: list[int], approx_ids: list[int], k: int) -> float:
    return len(set(exact_ids[:k]) & set(approx_ids[:k])) / float(k)


def ivf_search_batch(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_salts: int = 16,
    sq8: bool = False,
    sq8_store: DataFrame | None = None,
    rescore_factor: int = 3,
    gemm: bool | None = None,
    max_queries: int = 10_000,
) -> DataFrame:
    """N-query ANN through the IVF index in ONE distributed pass — the
    production serving shape (per-query ``ivf_search`` calls cost a
    driver round-trip each; here the whole query batch rides the plan).

    1. Probe selection is MAP-SIDE: per-centroid cosine distances are
       codegen'd expressions over the (tiny, constant) centroid table;
       each query keeps its ``nprobe`` best via array_sort + slice —
       ties break on centroid id, identical to ``rank_centroids``.
    2. The exploded (query, centroid) probe list — |queries|·nprobe tiny
       rows — BROADCASTS onto the corpus equi-join on ``centroid_id``,
       so only probed lists are scored (with a partitionBy(centroid_id)
       layout that is file-level partition pruning).
    3. Ranking is the salted two-phase top-k (operators/topk.knn_join's
       shape): no reducer ever sorts more than its salt share.

    Per-query results equal ``ivf_search`` exactly (tested).

    ``sq8=True`` switches to IVF-SQ8 serving: the first pass scores int8
    scalar-quantized vectors (functions/vector.quantize_int8 — 3.5×
    smaller rows on disk and over the probe-join wire) and keeps
    ``k·rescore_factor`` candidates per query; the exact top-k is then
    re-scored at full precision over only those candidates
    (|queries|·k·rescore_factor rows — a broadcast).  Cosine is
    scale-invariant, so the coarse score uses the RAW int8 array (the
    per-vector scale cancels) with its norm precomputed in the store —
    one fold per row instead of dequantize + three.  Pass ``sq8_store``
    (:func:`quantized_store`, persisted at index-build time like
    :func:`write_ivf_sq8_layout`) to avoid quantizing per query — the
    production shape; omitting it quantizes on the fly.  Parity with the
    full-precision path holds whenever the true top-k survives the
    quantized first pass — guaranteed only as rescore_factor→list size;
    at the default factor int8 rounding can in principle flip near-tied
    candidates at the k·rescore_factor boundary.  Measured equal on the
    testdata (tests/test_dedup.py::test_ivf_sq8_composition and the
    batch-parity test — empirical pins, not proofs); production SLAs
    should state recall@k, not exactness.

    AUTO-ROUTING: by default this delegates to
    :func:`ivf_search_batch_gemm` — same rows (parity-pinned), Arrow
    scoring.  The per-(row, query) HOF fold makes the expression spelling
    lose at EVERY measured size, not just wide dims (sf0.1 batch-100:
    8 lists × dim 64 = 4.4 s expression vs 0.5 s GEMM; 44 lists 5.7 s vs
    0.3 s; 70 lists × dim 64 14.4 s vs ~1 s).  In auto mode a query batch
    exceeding ``max_queries`` (the GEMM route's bounded driver fetch)
    FALLS BACK to the expression path — which never collects queries —
    instead of failing; pass ``gemm=True`` to make the bound a hard error,
    or ``gemm=False`` to pin the expression path (spec twin / tests)."""
    from pyspark.sql import Window

    dim = len(index.centers[0]) if index.centers else 0
    auto = gemm is None
    if auto:
        gemm = True
    store = None
    if sq8:
        store = (
            sq8_store
            if sq8_store is not None
            else quantized_store(index, id_col=id_col, vec_col=vec_col)
        )
    if gemm:
        try:
            return ivf_search_batch_gemm(
                index,
                queries,
                k,
                nprobe,
                query_id=query_id,
                query_vec=query_vec,
                id_col=id_col,
                vec_col=vec_col,
                sq8_store=store,
                rescore_factor=rescore_factor,
                max_queries=max_queries,
            )
        except QueryBatchTooLarge:
            if not auto:
                raise
            # auto mode: oversized batches take the unbounded (slower)
            # declarative path rather than surprising the caller — loudly,
            # because the cost envelope changes (sq8 stays honored: the
            # expression path below scores the same quantized store
            # coarse-then-rescore).
            import warnings

            warnings.warn(
                f"ivf_search_batch: query batch exceeds max_queries="
                f"{max_queries}; auto-falling back from the GEMM route to "
                "the declarative expression path (slower, never collects "
                "queries). Pass gemm=True to make this a hard error.",
                RuntimeWarning,
                stacklevel=2,
            )

    structs = []
    for cid, center in enumerate(index.centers):
        cl = V.query_vector_lit(center)
        d = V.cosine_distance(F.col(query_vec), cl)
        structs.append(
            F.struct(
                # NULL (zero-norm) sorts first in array_sort; map to +inf
                F.coalesce(d, F.lit(float("inf"))).alias("dist"),
                F.lit(cid).cast("int").alias("cid"),
            )
        )
    probe_arr = F.slice(F.array_sort(F.array(*structs)), 1, nprobe)
    probes = queries.select(
        query_id, query_vec, F.explode(probe_arr.cid).alias("centroid_id")
    )

    if sq8:
        first_k = k * rescore_factor
        probes_n = probes.withColumn("_qvn", V.l2_norm(query_vec))
        sim_q = F.when(
            (F.col("_qnorm") == 0.0) | (F.col("_qvn") == 0.0), F.lit(None).cast("double")
        ).otherwise(
            V.dot(F.col("_qs.q"), F.col(query_vec)) / (F.col("_qnorm") * F.col("_qvn"))
        )
        coarse = (
            store.join(F.broadcast(probes_n), "centroid_id")
            .select(query_id, F.col(id_col), sim_q.alias("similarity"))
            .where(F.col("similarity").isNotNull())
        )
        cand = _salted_topk(coarse, first_k, query_id, id_col, n_salts).select(query_id, id_col)
        rescored = (
            index.assigned.join(F.broadcast(cand), id_col)
            .join(F.broadcast(queries.select(query_id, query_vec)), query_id)
            .select(
                query_id,
                F.col(id_col),
                V.round6(V.cosine_similarity(F.col(vec_col), F.col(query_vec))).alias(
                    "similarity"
                ),
            )
            .where(F.col("similarity").isNotNull())
        )
        w = Window.partitionBy(query_id).orderBy(
            F.col("similarity").desc(), F.col(id_col).asc()
        )
        return rescored.withColumn("rank", F.row_number().over(w).cast("bigint")).where(
            F.col("rank") <= k
        )

    # norms precomputed ONCE per corpus row / per probe row: scoring then
    # costs one fold per (row, query) pair instead of three.  Same doubles
    # as cosine_similarity inline (identical dot/(na*nb) expression), so
    # oracle-rounded values are unchanged (parity pinned in test_dedup).
    corpus_n = index.assigned.withColumn("_cn", V.l2_norm(vec_col))
    probes_full = probes.withColumn("_qn", V.l2_norm(query_vec))
    sim = F.when(
        (F.col("_cn") == 0.0) | (F.col("_qn") == 0.0), F.lit(None).cast("double")
    ).otherwise(
        V.round6(V.dot(F.col(vec_col), F.col(query_vec)) / (F.col("_cn") * F.col("_qn")))
    )
    scored = (
        corpus_n.join(F.broadcast(probes_full), "centroid_id")
        .select(query_id, F.col(id_col), sim.alias("similarity"))
        .where(F.col("similarity").isNotNull())
    )
    return _salted_topk(scored, k, query_id, id_col, n_salts)


class QueryBatchTooLarge(ValueError):
    """The query batch exceeds the GEMM route's bounded driver fetch —
    distinct from other ValueErrors so auto-routing can fall back to the
    expression path on exactly this condition and nothing else."""


def _collect_query_batch(
    queries: DataFrame, query_id: str, query_vec: str, max_queries: int, dim: int | None
):
    """Bounded driver fetch of the query batch (queries are the small side
    by definition — same contract as the broadcast in ivf_search_batch);
    drops NULL / wrong-dim vectors exactly as the scoring paths do."""
    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise QueryBatchTooLarge(
            f"query batch exceeds max_queries={max_queries}; split the batch"
        )
    if dim is not None:
        qrows = [r for r in qrows if r[1] is not None and len(r[1]) == dim]
    if not qrows:
        raise ValueError("empty query batch")
    return qrows


def ivf_search_batch_gemm(
    index: IVFIndex,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    *,
    query_id: str = "query_id",
    query_vec: str = "query_embedding",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    sq8_store: DataFrame | None = None,
    rescore_factor: int = 3,
) -> DataFrame:
    """N-query IVF ANN with Arrow/GEMM scoring — the WIDE-dim serving path.

    :func:`ivf_search_batch` scores each (row, query) pair with a codegen
    HOF fold over the vector.  At dim 64 that is the right trade (stays
    JVM-side, no Python boundary); at the reference's real width
    (``vector(1536)``, query.txt:84 — actual embeddings dim 2048,
    text_generator.py:314-316) the per-element interpreted lambda cost
    dominates and the plan for probe selection would carry
    n_lists × dim literal expressions.  This variant:

    1. collects the bounded query batch driver-side (the pq_search_batch
       contract) and picks per-query probes in numpy — same distances and
       tie-breaks as :func:`rank_centroids` (zero-norm → +inf, ties on
       centroid id);
    2. filters the corpus to the probe UNION (file-level partition
       pruning on a persisted layout);
    3. scores each Arrow batch against ALL queries with ONE
       (batch × dim)·(dim × nq) GEMM, masks each query to ITS probe set
       (union-coarseness never leaks another query's lists into results),
       and emits only the per-batch top-k per query — the map-side
       partial-top-k combiner, so the shuffle carries
       O(batches · nq · k) rows;
    4. final exact top-k per query by (similarity DESC, id ASC).

    Output matches :func:`ivf_search_batch` row-for-row on the testdata
    (parity-tested; the GEMM accumulates pairwise vs the fold's
    left-to-right — a last-ulp difference only, erased by round6 except
    on knife-edge rounding boundaries never observed).

    ``sq8_store`` (from :func:`quantized_store` / a read-back
    :func:`write_ivf_sq8_layout` layout) switches to SQ8-GEMM serving:
    the coarse GEMM runs over the int8 codes (cosine is scale-invariant,
    so raw ints score correctly), keeps ``k·rescore_factor`` per query,
    and re-scores survivors at full precision — the IVF-SQ8 ladder with
    both passes GEMM-shaped."""
    import numpy as np
    import pandas as pd

    dim = len(index.centers[0]) if index.centers else None
    qrows = _collect_query_batch(queries, query_id, query_vec, max_queries, dim)
    qids = [r[0] for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1)
    live = qn > 0  # zero-norm queries produce NULL sims → no results
    qunit = np.where(live[:, None], qmat / np.where(qn == 0, 1.0, qn)[:, None], 0.0)

    cmat = np.array(index.centers, dtype=np.float64)
    cn = np.linalg.norm(cmat, axis=1)
    with np.errstate(invalid="ignore"):
        cd = 1.0 - (qunit @ (cmat / np.where(cn == 0, 1.0, cn)[:, None]).T)
    cd[:, cn == 0] = np.inf
    cd[~live, :] = np.inf
    n_lists = len(index.centers)
    # the probe mask ships DENSE in the task closure — a loud valve, not
    # an OOM, when lists × queries explodes (auto-√N lists on a 10⁹-row
    # corpus is ~32k lists; a 10k-query batch would be a 320 MB closure)
    if n_lists * len(qids) > 64_000_000:
        raise ValueError(
            f"ivf_search_batch_gemm: probe mask {n_lists} lists × "
            f"{len(qids)} queries exceeds 64M cells; split the query batch"
        )
    mask = np.zeros((n_lists, len(qids)), dtype=bool)  # (centroid, query)
    union: set[int] = set()
    for qi in range(len(qids)):
        if not live[qi]:
            continue
        order = np.lexsort((np.arange(n_lists), cd[qi]))[:nprobe]
        mask[order, qi] = True
        union.update(int(c) for c in order)
    probe_ids = sorted(union)

    qid_t = queries.schema[query_id].dataType.simpleString()
    id_field = index.assigned.schema[id_col]
    out_schema = (
        f"{query_id} {qid_t}, {id_field.name} {id_field.dataType.simpleString()}, "
        "similarity double"
    )
    qids_arr = np.array(qids)

    def make_scorer(vcol: str, keep: int):
        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                vals = pdf[vcol].tolist()
                ok = np.fromiter(
                    (v is not None and len(v) == dim for v in vals),
                    dtype=bool,
                    count=len(vals),
                )
                if not ok.any():
                    continue
                rows = np.flatnonzero(ok)
                m = np.stack([np.asarray(vals[i], dtype=np.float64) for i in rows])
                nrm = np.linalg.norm(m, axis=1)
                nz = nrm > 0
                rows = rows[nz]
                if not len(rows):
                    continue
                u = m[nz] / nrm[nz][:, None]
                sims = np.round(u @ qunit.T, 6)  # (B, nq)
                cids = pdf["centroid_id"].to_numpy()[rows].astype(np.int64)
                allowed = mask[cids, :] & live[None, :]  # (B, nq)
                sims = np.where(allowed, sims, -np.inf)
                ids = pdf[id_field.name].to_numpy()[rows]
                id_order = np.argsort(ids, kind="stable")
                out_q, out_i, out_s = [], [], []
                for qi in range(len(qids_arr)):
                    sq = sims[id_order, qi]
                    top = id_order[np.argsort(-sq, kind="stable")[: min(keep, len(rows))]]
                    good = sims[top, qi] > -np.inf
                    top = top[good]
                    out_q.extend([qids_arr[qi]] * len(top))
                    out_i.extend(ids[top].tolist())
                    out_s.extend(sims[top, qi].tolist())
                if out_q:
                    yield pd.DataFrame(
                        {query_id: out_q, id_field.name: out_i, "similarity": out_s}
                    )

        return score

    from pyspark.sql import Window

    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(id_col).asc()
    )
    if sq8_store is None:
        pruned = index.assigned.where(F.col("centroid_id").isin(probe_ids)).select(
            id_col, "centroid_id", vec_col
        )
        partial = pruned.mapInPandas(make_scorer(vec_col, k), schema=out_schema)
        return partial.withColumn("rank", F.row_number().over(w).cast("bigint")).where(
            F.col("rank") <= k
        )

    # SQ8 ladder: int8 coarse GEMM → top k·f per query → exact rescore
    first_k = k * rescore_factor
    coarse_src = sq8_store.where(F.col("centroid_id").isin(probe_ids)).select(
        id_col, "centroid_id", F.col("_qs.q").alias("_qvals")
    )
    cand = (
        coarse_src.mapInPandas(make_scorer("_qvals", first_k), schema=out_schema)
        .withColumn("_pr", F.row_number().over(w))
        .where(F.col("_pr") <= first_k)
        .select(query_id, id_col)
    )
    qdf = queries.select(query_id, query_vec)
    rescored = (
        index.assigned.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), query_id)
        .select(
            query_id,
            F.col(id_col),
            V.round6(V.cosine_similarity(F.col(vec_col), F.col(query_vec))).alias(
                "similarity"
            ),
        )
        .where(F.col("similarity").isNotNull())
    )
    return rescored.withColumn("rank", F.row_number().over(w).cast("bigint")).where(
        F.col("rank") <= k
    )


def _salted_topk(
    scored: DataFrame, k: int, query_id: str, id_col: str, n_salts: int
) -> DataFrame:
    """Two-phase per-query top-k on a (query_id, id, similarity) frame:
    salted partial top-k (no reducer sorts more than its salt share), then
    the final k among the k·n_salts survivors."""
    from pyspark.sql import Window

    order = [F.col("similarity").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(query_id, "_salt").orderBy(*order)
    partial = (
        scored.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
        .withColumn("_pr", F.row_number().over(w1))
        .where(F.col("_pr") <= k)
        .drop("_salt", "_pr")
    )
    w2 = Window.partitionBy(query_id).orderBy(*order)
    return partial.withColumn("rank", F.row_number().over(w2).cast("bigint")).where(
        F.col("rank") <= k
    )
