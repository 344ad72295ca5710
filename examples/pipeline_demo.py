"""Executable end-to-end corpus-prep walkthrough — every stage a real
operator from this engine, printed with before/after audit numbers.

    python examples/pipeline_demo.py [sf_dir] [out_dir]

Stages (the order real pipelines run them):

 1. ingest + HTML extraction        functions/html
 2. corpus report (before)          operators/textanalysis
 3. PII redaction                   functions/pii
 4. URL blocklist                   functions/url
 5. exact dedup (hash-first)        operators/dedup
 6. near-dup removal (MinHash)      operators/dedup
 7. duplicated-span excision        operators/substr
 8. benchmark decontamination       operators/decontam
 9. heuristic gates (Gopher/C4)     functions/quality
10. LM perplexity tail cut          operators/lm
11. learned quality score           operators/quality_clf
12. domain-weighted sample          operators/sampling
13. component-safe split            operators/sampling
14. corpus report (after)           operators/textanalysis
15. deterministic shards            sources/shards
16. semantic dedup (auto k)         operators/semdedup
17. ANN serving (auto lists)        operators/ivf
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="pipeline_demo_")

    from psy_supabase_spark.functions.html import html_to_text
    from psy_supabase_spark.functions.pii import redact_pii
    from psy_supabase_spark.functions.quality import quality_filter
    from psy_supabase_spark.functions.url import blocklist_filter
    from psy_supabase_spark.operators import decontam, dedup, lm, quality_clf, sampling, substr
    from psy_supabase_spark.operators.textanalysis import corpus_report
    from psy_supabase_spark.session import get_spark
    from psy_supabase_spark.sources.catalog import load_table
    from psy_supabase_spark.sources.shards import write_training_shards

    spark = get_spark("pipeline-demo")
    n0 = None

    def stage(msg, df):
        nonlocal n0
        n = df.count()
        print(f"  {msg:46s} {n:6d} docs" + (f"  ({n - n0:+d})" if n0 is not None else ""))
        n0 = n
        return df

    print(f"corpus: {sf_dir}\n")
    docs = stage("1. ingest", load_table(spark, sf_dir, "documents"))
    docs = stage("   + HTML extraction", docs.withColumn("text", html_to_text("text")))

    print("\n2. corpus report (before):")
    corpus_report(docs, group_cols=("lang",)).show(10, truncate=False)

    docs = stage("3. PII redaction", docs.withColumn("text", redact_pii("text")))
    docs = stage("4. URL blocklist", blocklist_filter(docs, ["spam.example.com"]))
    docs = stage(
        "5. exact dedup (hash-first)",
        docs.join(
            dedup.exact_dedup(docs, hash_first=True).select(
                F.col("keeper_id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        ),
    )
    # persist at phase boundaries: every stage() count is an action, and
    # an uncached 15-stage lineage re-executes from the scan each time —
    # in production these boundaries are parquet/txlog writes
    docs = docs.cache()
    pairs = dedup.minhash_lsh_pairs(docs, 0.8).cache()
    docs = stage("6. near-dup removal (MinHash j>=0.8)", dedup.dedup_keep_representative(docs, pairs))
    docs = stage("7. duplicated-span excision (L=20)", substr.excise_duplicate_spans(docs, 20))

    bench = docs.limit(3).select(F.substring("text", 10, 120).alias("text"))
    docs = stage("8. benchmark decontamination", decontam.decontaminate(docs, bench))
    # c4=False: the C4 terminal-punctuation rule zeroes this corpus of
    # unpunctuated synthetic lines (see the report's c4_pass_rate) —
    # gate families are knobs, not dogma
    pre_gate = docs  # the classifier trains on BOTH classes (see 11)
    docs = stage(
        "9. heuristic gates (gopher)",
        quality_filter(docs, c4=False, min_words=10, min_stopword_hits=1),
    )

    model = lm.train_bigram_lm(docs, vocab_cap=1_000_000, bigram_cap=10_000_000)
    scored = lm.score_documents(docs, model)
    cut = scored.approxQuantile("ppl", [0.9], 0.01)[0]
    docs = stage(f"10. LM perplexity tail cut (ppl<={cut:.0f})", lm.ppl_filter(docs, model, max_ppl=cut))

    # train on the PRE-gate corpus: post-gate docs are all one class by
    # construction (they just passed the teacher), which degenerates the fit
    labeled = quality_clf.weak_labels_from_gates(
        pre_gate, families=("gopher",), min_words=10, min_stopword_hits=1
    )
    clf = quality_clf.train_quality_classifier(labeled)
    docs = stage(
        "11. learned quality (keep prob>=0.3)",
        quality_clf.quality_filter_learned(docs, clf, min_prob=0.3),
    )

    docs = stage(
        "12. domain-weighted sample",
        sampling.domain_weighted_sample(docs, {"en": 90}, default_rate=50),
    ).cache()
    train, val, test = sampling.component_safe_split(docs, pairs, val_pct=5, test_pct=5)
    print(f"  13. component-safe split: train={train.count()} val={val.count()} test={test.count()}")

    print("\n14. corpus report (after):")
    corpus_report(train, group_cols=("lang",)).show(10, truncate=False)

    audit = write_training_shards(
        train.select("doc_id", "text", "lang", "source"), f"{out_dir}/shards", 4
    )
    print("15. shards written:", out_dir)
    audit.show()

    # ---- embedding side (round 6): the surviving corpus's vectors get
    # semantic dedup and an ANN serving index — auto-tuned (√N lists,
    # N/4096 clusters) and GEMM-routed when the width calls for it
    from psy_supabase_spark.operators import ivf, semdedup

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .join(train.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
        .cache()
    )
    n_emb = emb.count()
    kept = semdedup.semdedup(emb, 0.99, n_clusters=None).cache()
    print(f"\n16. semantic dedup (SemDeDup eps=0.99, auto k): {n_emb} -> {kept.count()} vectors")

    index = ivf.build_ivf(kept, n_lists=None)
    queries = (
        kept.limit(3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding"))
    )
    print(f"17. ANN serving (auto lists={len(index.centers)}, GEMM-routed when wide):")
    ivf.ivf_search_batch(index, queries, k=3, nprobe=4).show()
    return 0


if __name__ == "__main__":
    sys.exit(main())
