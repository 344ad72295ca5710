"""Benchmark driver — one JSON line on stdout.

Runs the headline queries (BASELINE.md: brute-force cosine top-k J2,
JSON recency top-k P3+O2, rolling context W1, taxonomy argmax A1, the
T6 cleaning pipeline, plus the heavy relational/dedup/sessionization
paths) at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].

IVF methodology (an index is build-once/search-many — the reference
instead re-created its ivfflat index per request, `main.py:57`):
the index is built and persisted ONCE outside the timed section
(`extra.ivf_build_sec`), a lists/nprobe sweep picks the cheapest config
with recall@10 ≥ 0.9 (`extra.ivf_recall_at_10`), and the timed
`ann_ivf_search` entry measures SEARCH ONLY against the persisted
partition-pruned layout.

Each query executes fully via the noop sink (no driver collect, no
result materialization cost in the timing).  The output schema is
stable round-over-round: {metric, value, unit, queries{name: sec},
sf, extra{...}} — diff BENCH_r{N}.json mechanically.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from psy_supabase_spark.operators import dedup  # noqa: E402
from psy_supabase_spark.registry import QUERIES  # noqa: E402
from psy_supabase_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "vector_topk_similarity",   # J2 brute-force cosine top-k
    "knn_join_multi",           # N-query broadcast KNN (salted two-phase)
    "json_filter_recency_topk", # P3+O2
    "rolling_context",          # W1
    "topic_classify_argmax",    # A1
    "ner_entity_boost",         # T4+A1 entity-boosted argmax (map-side)
    "response_clean",           # T6 ten-pass cleaning pipeline
    "pricing_summary",          # TPC-H Q1 shape
    "revenue_by_nation",        # multi-join shape
    "sessionize_gap30m",        # window + agg
    "asof_join_purchase_click", # as-of join (union + window, zero joins)
    "dedup_minhash_lsh",        # MinHash LSH near-dup
    "simhash_neardup",          # SimHash banded near-dup
    "embedding_neardup_lsh",    # SRP near-dup
    "text_profile",             # text-analysis scan
    "multimodal_features",      # mapInPandas path
    "events_hourly_rollup",     # tumbling rollup
    "winnow_neardup",           # winnowing fingerprints + pair search
    "semdedup_pairs",           # SemDeDup cluster + within-cluster GEMM
    "lm_score",                 # bigram Stupid-Backoff train + score
    "exact_substr",             # ExactSubstr span excision (Lee 2021)
]


def _winnow_neardup(spark, sf_dir):
    # not in the 50-slot driver registry (its oracle evidence is absorbed
    # into doc_adjacent_stats); benched directly so the newest dedup
    # modality has a tracked perf number.  df_cap=100 (2% of the sf0.1
    # corpus): 8-char shingles are common English, so corpus-level pair
    # search MUST drop high-df fingerprints or the inverted index goes
    # quadratic on boilerplate (measured: df_cap=100k → 10.7M junk pairs
    # in 66s; df_cap=100 → 506 true partial-overlap pairs in 3s)
    from psy_supabase_spark.operators import winnow
    from psy_supabase_spark.sources.catalog import load_table

    return winnow.winnow_neardup_pairs(
        load_table(spark, sf_dir, "documents"), 5, df_cap=100
    )


def _semdedup_pairs(spark, sf_dir):
    # SemDeDup pair stage over the embeddings table: seeded k-means fit +
    # one GEMM assignment pass + within-cluster GEMM pair search.  eps
    # 0.5 (the corpus is uniform-random — its worst case, like IVF).
    from psy_supabase_spark.operators import semdedup
    from psy_supabase_spark.sources.catalog import load_table

    return semdedup.semdedup_pairs(
        load_table(spark, sf_dir, "embeddings"), 0.5, n_clusters=8
    )


def _lm_score(spark, sf_dir):
    # CCNet LM stage end-to-end: train the bigram Stupid-Backoff model on
    # the corpus (two count shuffles) and score every doc (bounded model
    # -> broadcast probes)
    from psy_supabase_spark.operators import lm
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = lm.train_bigram_lm(docs, vocab_cap=1_000_000, bigram_cap=10_000_000)
    return lm.score_documents(docs, model)


def _exact_substr(spark, sf_dir):
    # ExactSubstr excision end-to-end (window rows -> dup grams -> merge
    # -> rebuild) at L=20: the synthetic corpus has little true span
    # duplication, so this prices the machinery, not the removals
    from psy_supabase_spark.operators import substr
    from psy_supabase_spark.sources.catalog import load_table

    return substr.excise_duplicate_spans(
        load_table(spark, sf_dir, "documents"), 20
    )


LOCAL_QUERIES = {
    "winnow_neardup": _winnow_neardup,
    "semdedup_pairs": _semdedup_pairs,
    "lm_score": _lm_score,
    "exact_substr": _exact_substr,
}

# (lists, nprobe) sweep, cheapest scan fraction first; first config with
# recall@10 >= 0.9 wins.  Uniform-random vectors are IVF's worst case —
# real embedding corpora cluster far better, so this is a lower bound.
IVF_SWEEP = [(16, 8), (8, 4), (8, 5), (8, 6), (16, 12)]
IVF_RECALL_TARGET = 0.9


def _run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _ivf_section(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, object]]:
    from pyspark.sql import functions as F

    from psy_supabase_spark.operators import ivf, topk
    from psy_supabase_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = list(emb.where(F.col("vec_id") == 0).select("embedding").head()[0])
    exact_ids = [r.vec_id for r in topk.topk_similarity(emb, qvec, k=10).collect()]

    chosen, chosen_recall, best = None, -1.0, None
    for lists, nprobe in IVF_SWEEP:
        index = ivf.build_ivf_cached(emb, f"{sf_dir}/embeddings", n_lists=lists)
        ids = [r.vec_id for r in ivf.ivf_search(index, qvec, k=10, nprobe=nprobe).collect()]
        recall = ivf.recall_at_k(exact_ids, ids, 10)
        if best is None or recall > best[2]:
            best = (lists, nprobe, recall)
        if recall >= IVF_RECALL_TARGET:
            chosen, chosen_recall = (lists, nprobe), recall
            break
    if chosen is None:  # fall back to the best-observed config
        chosen, chosen_recall = (best[0], best[1]), best[2]
    lists, nprobe = chosen

    # amortized build: fit + assign + persist the partition-pruned layout
    layout = os.path.join(tempfile.mkdtemp(prefix="ivf_bench_"), "layout")
    t0 = time.time()
    index = ivf.build_ivf(emb, n_lists=lists)
    ivf.write_ivf_layout(index, layout)
    build_sec = round(time.time() - t0, 3)

    # timed search ONLY: file-level partition pruning on the layout
    t0 = time.time()
    _run(ivf.search_layout(spark, layout, index.centers, qvec, k=5, nprobe=nprobe))
    search_sec = round(time.time() - t0, 3)

    # IVF-SQ8 serving twin: int8 first pass + full-precision rescore over a
    # 100-query batch, vs the same batch at full precision — measures the
    # quantized path end-to-end and its recall against exact brute force
    queries = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding")
    )
    t0 = time.time()
    _run(ivf.ivf_search_batch(index, queries, k=10, nprobe=nprobe))
    batch_full_sec = round(time.time() - t0, 3)
    # SQ8 store is BUILD-time work: persist it like the layout, read it
    # back, and time serving against the stored int8 form only
    sq8_path = os.path.join(tempfile.mkdtemp(prefix="ivf_sq8_"), "sq8")
    ivf.write_ivf_sq8_layout(index, sq8_path)
    sq8_store = spark.read.parquet(sq8_path)
    t0 = time.time()
    _run(ivf.ivf_search_batch(index, queries, k=10, nprobe=nprobe, sq8=True, sq8_store=sq8_store))
    batch_sq8_sec = round(time.time() - t0, 3)
    sq8_ids = [
        r.vec_id
        for r in ivf.ivf_search_batch(
            index,
            queries.where(F.col("query_id") == 0),
            k=10,
            nprobe=nprobe,
            sq8=True,
            sq8_store=sq8_store,
        ).collect()
    ]
    sq8_recall = ivf.recall_at_k(exact_ids, sq8_ids, 10)

    # PQ serving tier (operators/pq): 8-byte codes (32x vs float32), ADC
    # map-side scoring + exact rescore.  Fit + encode are build-time like
    # the layouts; timed = the 100-query batch only.
    from psy_supabase_spark.operators import pq

    t0 = time.time()
    books = pq.pq_fit(emb, m=8)
    pq_path = os.path.join(tempfile.mkdtemp(prefix="ivf_pq_"), "pq")
    pq.pq_encode(emb, books).write.mode("overwrite").parquet(pq_path)
    pq_build_sec = round(time.time() - t0, 3)
    enc = spark.read.parquet(pq_path)
    t0 = time.time()
    _run(pq.pq_search_batch(enc, queries, books, emb, k=10, rescore_factor=8))
    batch_pq_sec = round(time.time() - t0, 3)
    pq_ids = [
        r.vec_id
        for r in pq.pq_search_batch(
            enc, queries.where(F.col("query_id") == 0), books, emb, k=10, rescore_factor=8
        ).collect()
    ]
    pq_recall = ivf.recall_at_k(exact_ids, pq_ids, 10)

    timings = {"ann_ivf_search": search_sec}
    extra = {
        "ivf_build_sec": build_sec,
        "ivf_lists": lists,
        "ivf_nprobe": nprobe,
        "ivf_recall_at_10": chosen_recall,
        "ivf_batch100_full_sec": batch_full_sec,
        "ivf_batch100_sq8_sec": batch_sq8_sec,
        "ivf_sq8_recall_at_10": sq8_recall,
        "pq_build_sec": pq_build_sec,
        "pq_batch100_sec": batch_pq_sec,
        "pq_recall_at_10": pq_recall,
    }
    return timings, extra


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warm the JVM + parquet footers once so timings measure the queries
    from psy_supabase_spark.sources.catalog import load_table

    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    # min of 2 runs per query: single-run numbers on this box swing ±20%
    # (JIT, page cache, GC); the min is the stable capability estimate and
    # makes round-over-round BENCH diffs meaningful
    # the LSH trio swings hardest (multi-stage plans, pandas-UDF stages);
    # a third repetition pins their min to the stable estimate
    noisy = {"dedup_minhash_lsh", "simhash_neardup", "embedding_neardup_lsh"}
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(3 if name in noisy else 2):
            t0 = time.time()
            _run((QUERIES.get(name) or LOCAL_QUERIES[name])(spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    ivf_timings, ivf_extra = _ivf_section(spark, sf_dir)
    timings.update(ivf_timings)

    # measure (not just name) the cost of default-on hot-id salting on the
    # headline minhash query: same operator, valve off — the delta IS the
    # protection premium the bench notes below explain
    docs = load_table(spark, sf_dir, "documents")
    unsalted = None
    for _ in range(2):
        t0 = time.time()
        _run(dedup.minhash_lsh_pairs(docs, 0.5, hot_id_threshold=None))
        dt = time.time() - t0
        unsalted = dt if unsalted is None else min(unsalted, dt)
    salt_overhead = round(timings["dedup_minhash_lsh"] - unsalted, 3)

    # same treatment for text_profile's r5 growth: the headline query
    # absorbed the Gopher/C4 gates + Arrow repetition signals; measure
    # the profile without the gate columns so the absorbed-evidence cost
    # stays a number, not a narrative
    from psy_supabase_spark.operators import textanalysis as TA

    profile_base = None
    for _ in range(2):
        t0 = time.time()
        _run(TA.text_profile(docs))
        dt = time.time() - t0
        profile_base = dt if profile_base is None else min(profile_base, dt)
    gates_overhead = round(timings["text_profile"] - profile_base, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "extra": {
                    "schema_version": 2,
                    **ivf_extra,
                    # r5: minhash/srp pay for default-on hot-id detection
                    # (dedup.hot_id_estimate: one narrow job over the banded
                    # subtree) after proving default AQE will NOT split the
                    # skewed verify join (tests/test_scale.py) — the r4
                    # checkpoint+collect spelling was faster locally but
                    # non-fault-tolerant and nondeterministic.  The premium
                    # is measured every run: salted headline minus the
                    # valve-off spelling of the same operator.
                    "hot_id_detection": "default_on_estimated",
                    "minhash_unsalted_sec": round(unsalted, 3),
                    "minhash_salt_overhead_sec": salt_overhead,
                    "text_profile_gates_overhead_sec": gates_overhead,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
