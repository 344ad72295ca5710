"""Benchmark driver — one JSON line on stdout.

Runs the headline queries (BASELINE.md: brute-force cosine top-k J2,
IVF-pruned top-k X1 with recall@10, JSON recency top-k P3+O2, rolling
context W1, taxonomy argmax A1 — plus the heavy relational/dedup/
sessionization paths) at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

Each query executes fully via the noop sink (no driver collect, no
result materialization cost in the timing).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from psy_supabase_spark.registry import QUERIES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "vector_topk_similarity",   # J2 brute-force cosine top-k
    "ann_ivf_topk",             # X1 IVF build + pruned search
    "knn_join_multi",           # N-query broadcast KNN
    "json_filter_recency_topk", # P3+O2
    "rolling_context",          # W1
    "topic_classify_argmax",    # A1
    "pricing_summary",          # TPC-H Q1 shape
    "revenue_by_nation",        # multi-join shape
    "sessionize_gap30m",        # window + agg
    "dedup_minhash_lsh",        # MinHash LSH near-dup
    "simhash_neardup",          # SimHash banded near-dup
    "embedding_neardup_lsh",    # SRP near-dup
    "text_profile",             # text-analysis scan
    "multimodal_features",      # mapInPandas path
    "events_hourly_rollup",     # tumbling rollup
]


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the JVM + parquet footers once so timings measure the queries
    from psy_supabase_spark.sources.catalog import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _run(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # IVF recall@10 vs exact (the pgvector lists/probes quality metric)
    from pyspark.sql import functions as F

    from psy_supabase_spark.operators import ivf, topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.where(F.col("vec_id") == 0).select("embedding").head()[0])
    exact_ids = [r.vec_id for r in topk.topk_similarity(emb, qvec, k=10).collect()]
    index = ivf.build_ivf(emb, n_lists=8)
    approx_ids = [r.vec_id for r in ivf.ivf_search(index, qvec, k=10, nprobe=4).collect()]
    recall = ivf.recall_at_k(exact_ids, approx_ids, 10)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "extra": {"ivf_recall_at_10_nprobe4of8": recall},
            }
        )
    )


if __name__ == "__main__":
    main()
