"""One-off probe: time the vector family at dim 1536 to size the bench
section (not part of the bench; see bench.py's dim1536 section)."""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from psy_supabase_spark.operators import ivf, lsh, pq, semdedup, topk
from psy_supabase_spark.session import get_spark
from psy_supabase_spark.sources.synth import synthetic_embeddings

N = int(os.environ.get("N", "20000"))
DIM = 1536

spark = get_spark("dim1536-probe")
t0 = time.time()
path = os.path.join(tempfile.mkdtemp(prefix="dim1536_"), "emb")
synthetic_embeddings(spark, N, DIM, n_modes=32).write.parquet(path)
emb = spark.read.parquet(path)
emb.count()
print("gen+persist", round(time.time() - t0, 2))

qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]

t0 = time.time()
exact1 = topk.topk_similarity(emb, qvec, k=10).collect()
print("exact_expr_topk_1q", round(time.time() - t0, 2))

t0 = time.time()
index = ivf.build_ivf(emb, n_lists=32)
index.assigned = index.assigned.cache()
index.assigned.count()
print("ivf_build_32", round(time.time() - t0, 2))

queries = emb.where(F.col("vec_id") < 100).select(
    F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
)
q10 = queries.where(F.col("query_id") < 10)

# ground truth via full-probe GEMM (brute force)
t0 = time.time()
gt = ivf.ivf_search_batch_gemm(index, q10, k=10, nprobe=32).collect()
print("gemm_fullprobe_10q (exact)", round(time.time() - t0, 2))
gt_by_q = {}
for r in gt:
    gt_by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))

t0 = time.time()
got = ivf.ivf_search_batch_gemm(index, queries, k=10, nprobe=4).collect()
print("gemm_batch100_nprobe4", round(time.time() - t0, 2))
by_q = {}
for r in got:
    by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
recalls = []
for qid, rows in gt_by_q.items():
    exact_ids = [v for _, v in sorted(rows)]
    ann_ids = [v for _, v in sorted(by_q.get(qid, []))]
    recalls.append(ivf.recall_at_k(exact_ids, ann_ids, 10))
print("recall@10 avg over 10q:", sum(recalls) / len(recalls))

t0 = time.time()
ivf.ivf_search_batch(index, q10, k=10, nprobe=4).write.mode("overwrite").format("noop").save()
print("expr_batch10_nprobe4", round(time.time() - t0, 2))

t0 = time.time()
store = ivf.quantized_store(index)
store = store.cache()
store.count()
print("sq8_store_build", round(time.time() - t0, 2))
t0 = time.time()
ivf.ivf_search_batch_gemm(index, queries, k=10, nprobe=4, sq8_store=store).write.mode(
    "overwrite"
).format("noop").save()
print("sq8_gemm_batch100", round(time.time() - t0, 2))

t0 = time.time()
books = pq.pq_fit(emb, m=16)
enc = pq.pq_encode(emb, books).cache()
enc.count()
print("pq_fit_encode_m16", round(time.time() - t0, 2))
t0 = time.time()
pqres = pq.pq_search_batch(enc, queries, books, emb, k=10, rescore_factor=8).collect()
print("pq_batch100", round(time.time() - t0, 2))
pq_by_q = {}
for r in pqres:
    pq_by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id))
prec = []
for qid, rows in gt_by_q.items():
    exact_ids = [v for _, v in sorted(rows)]
    ann_ids = [v for _, v in sorted(pq_by_q.get(qid, []))]
    prec.append(ivf.recall_at_k(exact_ids, ann_ids, 10))
print("pq recall@10 avg:", sum(prec) / len(prec))

t0 = time.time()
n = lsh.srp_neardup_pairs(emb, 0.9, dim=DIM).count()
print("srp_neardup_pairs_09", round(time.time() - t0, 2), "pairs:", n)

t0 = time.time()
n = semdedup.semdedup_pairs(emb, 0.9, n_clusters=32).count()
print("semdedup_pairs_09", round(time.time() - t0, 2), "pairs:", n)
