"""Streaming admission pipeline: the stateless corpus-prep stages
(decontamination flag, quality gates, PII redaction, URL blocklist)
compose on a readStream frame exactly as in batch — one availableNow
pass, batch-equivalent output."""

from __future__ import annotations

from pyspark.sql import functions as F

from psy_supabase_spark.functions.pii import redact_pii
from psy_supabase_spark.functions.quality import gopher_quality_flags
from psy_supabase_spark.functions.url import is_blocked
from psy_supabase_spark.operators.decontam import flag_contaminated

GOOD = (
    "the quick brown fox jumps over that lazy dog and runs on with vigor "
    "through the long morning fields past the barn and over the stream "
    "while the farmer watches from the gate with a warm cup in hand"
)

EVAL_SNIPPET = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

DOCS = [
    (0, GOOD + " write to me at who@example.org"),          # admitted, redacted
    (1, GOOD + " see https://spam.bad.site/x"),             # URL-blocked
    (2, "too short"),                                        # quality-rejected
    (3, EVAL_SNIPPET + " " + GOOD),                          # contaminated vs bench
]


def _admission(df, bench):
    flagged = flag_contaminated(df, bench, n=8)
    g = gopher_quality_flags("text", min_words=30, min_stopword_hits=1)
    return (
        flagged.withColumn("_q", g)
        .where(~F.col("is_contaminated") & F.col("_q.passes") & ~is_blocked("text", ["bad.site"]))
        .select("doc_id", redact_pii("text").alias("text"))
    )


def test_streaming_admission_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    batch = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch.write.parquet(str(src))
    bench = spark.createDataFrame([(EVAL_SNIPPET,)], "text string")

    want = {(r.doc_id, r.text) for r in _admission(batch, bench).collect()}
    # doc 0 admitted with the email redacted; 1-3 rejected for distinct reasons
    assert {d for d, _ in want} == {0}
    (admitted_text,) = [t for _, t in want]
    assert "[EMAIL]" in admitted_text and "who@example.org" not in admitted_text

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = _admission(stream, spark.createDataFrame([(EVAL_SNIPPET,)], "text string"))
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("admission")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.doc_id, r.text) for r in spark.sql("SELECT * FROM admission").collect()}
    assert got == want


def test_full_admission_with_lm_and_classifier(spark, tmp_path):
    """The COMPLETE stateless admission stack — contamination flag,
    heuristic gates, URL blocklist, PII redaction, LM fluency score,
    learned quality probability — composes in one streaming pass and
    matches batch."""
    from psy_supabase_spark.operators import lm, quality_clf

    src = tmp_path / "src2"
    batch = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch.write.parquet(str(src))
    bench = spark.createDataFrame([(EVAL_SNIPPET,)], "text string")

    ref = spark.createDataFrame([(i, GOOD) for i in range(10)], "doc_id long, text string")
    model = lm.collect_model(
        lm.train_bigram_lm(ref, vocab_cap=10_000, bigram_cap=100_000)
    )
    labeled = spark.createDataFrame(
        [(i, GOOD + f" v{i}", 1.0) for i in range(20)]
        + [(100 + i, f"zq zq zq lorem {i}", 0.0) for i in range(20)],
        "doc_id long, text string, label double",
    )
    clf = quality_clf.train_quality_classifier(labeled, n_features=1 << 12)

    def full(df):
        out = _admission(df, bench)
        out = lm.score_stream(out, model)
        return quality_clf.score_quality(out, clf)

    want = {
        (r.doc_id, r.avg_logprob, r.quality_prob) for r in full(batch).collect()
    }
    assert len(want) == 1  # doc 0 only, now carrying both scores
    (row,) = want
    assert row[1] is not None and row[2] > 0.5

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    q = (
        full(stream)
        .writeStream.format("memory")
        .queryName("admission_full")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    got = {
        (r.doc_id, r.avg_logprob, r.quality_prob)
        for r in spark.sql("SELECT * FROM admission_full").collect()
    }
    assert got == want
