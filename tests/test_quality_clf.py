"""Learned quality classifier (operators/quality_clf): separable-corpus
sanity, weak-label bootstrap agreement, scoring schema hygiene, filter
threshold, and the no-Python-UDF plan check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import quality_clf


GOOD = "the quick brown fox jumps over the lazy dog and then walks home quietly"
JUNK = "zxq zxq zxq lorem ipsum {{{ }}} buy now click here zxq zxq"


@pytest.fixture(scope="module")
def separable(spark):
    rows = [(i, f"{GOOD} variant {i}", 1.0) for i in range(40)] + [
        (100 + i, f"{JUNK} {i}", 0.0) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_separable_corpus_ranks_correctly(spark, separable):
    model = quality_clf.train_quality_classifier(separable, n_features=1 << 12)
    scored = quality_clf.score_quality(separable, model)
    rows = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    good = [v for k, v in rows.items() if k < 100]
    junk = [v for k, v in rows.items() if k >= 100]
    assert min(good) > max(junk)
    assert min(good) > 0.9 and max(junk) < 0.1


def test_scoring_drops_ml_plumbing_columns(spark, separable):
    model = quality_clf.train_quality_classifier(separable, n_features=1 << 12)
    out = quality_clf.score_quality(separable.drop("label"), model)
    assert set(out.columns) == {"doc_id", "text", "quality_prob"}


def test_learned_filter_threshold(spark, separable):
    model = quality_clf.train_quality_classifier(separable, n_features=1 << 12)
    kept = quality_clf.quality_filter_learned(separable, model, min_prob=0.5)
    assert {r["doc_id"] for r in kept.collect()} == set(range(40))


def test_weak_label_bootstrap_generalizes_gates(spark):
    """Train on gate-derived weak labels over the real corpus; the
    classifier must agree with its teacher on a large majority (it
    smooths the hard thresholds, so 100% agreement is not expected)."""
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # gopher-only: C4's terminal-punctuation rule fails this whole corpus
    # (no punctuated line endings), which would collapse labels to one class
    labeled = quality_clf.weak_labels_from_gates(
        docs, families=("gopher",), min_words=25, min_stopword_hits=1
    )
    labels = {r["doc_id"]: r["label"] for r in labeled.select("doc_id", "label").collect()}
    assert 0.0 < sum(labels.values()) < len(labels), "need both classes"
    model = quality_clf.train_quality_classifier(labeled)
    scored = quality_clf.score_quality(labeled, model)
    agree = scored.where(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1.0))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0.0))
    ).count()
    assert agree / len(labels) >= 0.85


def test_no_python_udf_in_scoring_plan(spark, separable):
    model = quality_clf.train_quality_classifier(separable, n_features=1 << 12)
    plan = (
        quality_clf.score_quality(separable, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scoring_is_stream_admissible(spark, separable, tmp_path):
    """score_quality is a stateless transform of broadcast weights, so it
    runs unchanged on a readStream frame (batch/stream-twin rule)."""
    model = quality_clf.train_quality_classifier(separable, n_features=1 << 12)
    src = str(tmp_path / "src")
    separable.drop("label").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        quality_clf.score_quality(stream, model)
        .writeStream.format("memory")
        .queryName("clf_admission")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: r["quality_prob"]
        for r in spark.sql("SELECT * FROM clf_admission").collect()
    }
    want = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_clf.score_quality(separable.drop("label"), model).collect()
    }
    assert got == want


def test_pinned_weight_scoring_matches_hand_math(spark):
    import math

    w = {"good": 1.0, "bad": -2.0}
    docs = spark.createDataFrame(
        [(0, "good good bad"), (1, "nothing matches here"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.p
        for r in quality_clf.score_with_pinned_weights(
            docs, w, 0.5, prob_col="p"
        ).collect()
    }
    sig = lambda z: 1.0 / (1.0 + math.exp(-z))  # noqa: E731
    assert abs(got[0] - sig(0.5 + 1.0 + 1.0 - 2.0)) < 1e-12
    assert abs(got[1] - sig(0.5)) < 1e-12  # unknown tokens contribute 0
    assert abs(got[2] - sig(0.5)) < 1e-12  # empty text → intercept only


def test_pinned_weight_scoring_counts_every_occurrence(spark):
    docs = spark.createDataFrame(
        [(0, "fast"), (1, "fast fast fast")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.p
        for r in quality_clf.score_with_pinned_weights(
            docs, {"fast": 0.3}, 0.0, prob_col="p"
        ).collect()
    }
    assert got[1] > got[0]  # occurrences accumulate, not set-membership


def test_null_text_scores_and_labels_instead_of_crashing(spark, separable):
    """r14 review: a NULL text doc NPE'd HashingTF's UDF (the
    SQLTransformer tokenized NULL to a NULL array) and nulled the weak
    label (which LogisticRegression.fit rejects corpus-wide).  Null
    text now tokenizes as empty, labels 0.0, and scores like any
    empty doc."""
    labeled = quality_clf.weak_labels_from_gates(separable)
    model = quality_clf.train_quality_classifier(labeled)
    with_null = separable.select("doc_id", "text").unionByName(
        spark.createDataFrame([(999, None)], "doc_id long, text string")
    )
    lbl = quality_clf.weak_labels_from_gates(with_null)
    assert (
        lbl.where(F.col("doc_id") == 999).head().label == 0.0
    )  # fails the gates, never NULL
    scored = quality_clf.score_quality(with_null, model)
    row = scored.where(F.col("doc_id") == 999).head()
    assert row.quality_prob is not None  # scored, not crashed
    # a fully-null corpus even trains (degenerate but loud elsewhere)
    assert scored.count() == with_null.count()


def test_gate_overrides_without_gopher_family_raise(spark, separable):
    """r14 review: overrides silently dropped when 'gopher' was not in
    families — the caller trained on different labels than configured."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gopher"):
        quality_clf.weak_labels_from_gates(
            separable, families=("c4",), min_doc_words=10
        )
