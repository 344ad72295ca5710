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
