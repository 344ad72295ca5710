"""Gopher/C4 quality gates: each rule trips on a crafted doc, a clean doc
passes everything, the composed filter stays map-side (no Exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.functions.quality import (
    c4_quality_flags,
    gopher_quality_flags,
    quality_filter,
)
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"

# 60 plain words, mean length ~4.5, stopwords present, no bullets/symbols
GOOD = " ".join(
    ["the quick brown fox jumps over that lazy dog and runs with vigor"] * 5
)


def _gopher(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(gopher_quality_flags("text", **kw).alias("g")).head().g


def _c4(spark, text, **kw):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(c4_quality_flags("text", **kw).alias("c")).head().c


def test_good_doc_passes_everything(spark):
    g = _gopher(spark, GOOD)
    assert g.passes and g.word_count == 65
    c = _c4(spark, GOOD + ".")
    assert c.passes


@pytest.mark.parametrize(
    "mutate,failed_rule",
    [
        (lambda t: "short doc", "word_count_ok"),
        (lambda t: " ".join(["a"] * 60), "mean_word_len_ok"),  # mean len 1
        (lambda t: t + " " + " ".join(["####"] * 20), "symbol_ratio_ok"),
        (lambda t: "\n".join("- " + w for w in t.split()), "bullet_lines_ok"),
        (lambda t: "\n".join(w + "..." for w in t.split()), "ellipsis_lines_ok"),
        (lambda t: t + " " + " ".join(["123"] * 40), "alpha_words_ok"),
        (
            lambda t: " ".join(["zebra apple mango cherry banana"] * 12),
            "stopwords_ok",
        ),
    ],
)
def test_each_gopher_rule_trips(spark, mutate, failed_rule):
    g = _gopher(spark, mutate(GOOD))
    assert not g[failed_rule]
    assert not g.passes


def test_unicode_ellipsis_counts_as_full_symbol(spark):
    """'…' is one symbol per occurrence, same weight as one '...' — not a
    third of one (the shared delta/3 bug)."""
    three_dot = _gopher(spark, GOOD + " " + "... " * 10)
    unicode_e = _gopher(spark, GOOD + " " + "… " * 10)
    # both add exactly 10 symbols over the same 65-word base; with the /3
    # bug the unicode doc undercounted at ~3.33 and wrongly passed
    assert three_dot.symbol_ratio_ok == unicode_e.symbol_ratio_ok
    assert not unicode_e.symbol_ratio_ok


def test_each_c4_rule_trips(spark):
    assert not _c4(spark, GOOD + " lorem ipsum dolor.").no_lorem_ipsum
    assert not _c4(spark, GOOD + " {json}.").no_curly_brace
    assert not _c4(spark, "no terminal punctuation here\nnor here").terminal_lines_ok


def test_thresholds_are_overridable(spark):
    assert not _gopher(spark, GOOD, min_words=100).passes
    assert _c4(spark, "bare line\nbare line", min_terminal_line_frac=0.0).passes


def test_quality_filter_composes_and_stays_mapside(spark):
    docs = load_table(spark, SF, "documents")
    # defaults are tuned for web text: the synthetic word-salad corpus
    # (no punctuation, ~one stopword) correctly fails them wholesale
    assert quality_filter(docs).count() == 0
    # corpus-appropriate knobs give a strict, non-empty subset
    kept = quality_filter(
        docs, min_words=5, min_stopword_hits=1, min_terminal_line_frac=0.0
    )
    n_all, n_kept = docs.count(), kept.count()
    assert 0 < n_kept < n_all
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # audit form keeps the per-rule structs for rejected-doc forensics
    flags = quality_filter(
        docs, min_words=5, min_stopword_hits=1, min_terminal_line_frac=0.0,
        keep_flags=True,
    )
    assert {"gopher_flags", "c4_flags"} <= set(flags.columns)
    reasons = flags.select(F.col("gopher_flags.passes")).distinct().collect()
    assert all(r[0] for r in reasons)  # filtered rows all pass


def test_rejects_explain_themselves(spark):
    docs = load_table(spark, SF, "documents")
    audited = docs.select(
        "doc_id", gopher_quality_flags("text", min_words=5).alias("g")
    ).where(~F.col("g.passes"))
    # every rejected doc has >=1 concrete failed rule
    rule_cols = [f"g.{r}" for r in (
        "word_count_ok", "mean_word_len_ok", "symbol_ratio_ok", "bullet_lines_ok",
        "ellipsis_lines_ok", "alpha_words_ok", "stopwords_ok")]
    bad = audited.where(F.greatest(*[~F.col(r) for r in rule_cols]) == F.lit(False))
    assert bad.count() == 0


# ---- Gopher repetition family ----

from psy_supabase_spark.functions.quality import repetition_flags


def _rep(spark, text, **thr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(repetition_flags("text", **thr).alias("r")).head().r


def test_repetition_known_fractions(spark):
    # "a b a b a b": 2-grams [a b, b a, a b, b a, a b] -> top 'a b' 3x3=9
    # of 15 occurrence chars; 3-grams all duplicated -> dup3 = 1.0
    r = _rep(spark, "a b a b a b")
    assert r.top2gram_char_frac == 0.6 and r.dup3gram_char_frac == 1.0
    assert not r.passes
    # no repeated grams at all -> dup3 clean (top2 is inherently high on
    # tiny docs: the single most frequent 2-gram covers 1/#grams of the
    # chars even with no repetition — the paper's signal targets long docs)
    r2 = _rep(spark, "unique words only here today")
    assert r2.dup3gram_char_frac == 0.0 and r2.dup3gram_ok


def test_repetition_tie_breaks_on_smallest_gram(spark):
    # 'x y' and 'y x' both occur twice; top must be the lexicographically
    # smallest max-count gram in BOTH engines ('x y' after sort)
    r = _rep(spark, "x y x y")
    # grams: [x y, y x, x y] -> 'x y' 2x, 'y x' 1x; unambiguous
    assert r.top2gram_char_frac == round(2 * 3 / 9, 6)


def test_repetition_short_and_empty_docs(spark):
    for text in ("", "one", "two words"):
        r = _rep(spark, text)
        assert r.dup3gram_char_frac == 0.0 and r.dup3gram_ok
    # below 2 tokens there are no 2-grams at all -> 0.0 by convention
    assert _rep(spark, "").top2gram_char_frac == 0.0
    assert _rep(spark, "one").top2gram_char_frac == 0.0
    # exactly one 2-gram covers all of itself
    assert _rep(spark, "two words").top2gram_char_frac == 1.0


def test_repetition_thresholds_overridable(spark):
    assert not _rep(spark, "a b a b a b", max_top2gram_char_frac=0.5).top2gram_ok
    assert _rep(spark, "a b a b a b", max_top2gram_char_frac=0.61).top2gram_ok


def test_repetition_is_exchange_free(spark):
    docs = load_table(spark, SF, "documents")
    df = docs.select(repetition_flags("text").alias("r"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_arrow_twin_matches_fold(spark):
    from psy_supabase_spark.functions.quality import repetition_flags_arrow
    from psy_supabase_spark.functions.text import tokenize
    from psy_supabase_spark.functions.quality import repetition_flags_from_tokens

    crafted = ["a b a b a b", "x y x y", "", "one", "two words",
               "the cat sat on the mat the cat sat again"]
    docs = load_table(spark, SF, "documents").select(F.col("text")).limit(200)
    extra = spark.createDataFrame([(t,) for t in crafted], "text string")
    both = docs.unionByName(extra).select(
        repetition_flags_from_tokens(tokenize("text")).alias("f"),
        repetition_flags_arrow("text").alias("a"),
    )
    mismatch = both.where(
        (F.col("f.top2gram_char_frac") != F.col("a.top2gram_char_frac"))
        | (F.col("f.dup3gram_char_frac") != F.col("a.dup3gram_char_frac"))
        | (F.col("f.passes") != F.col("a.passes"))
    )
    assert mismatch.count() == 0


def test_compression_ratio_two_sided(spark):
    from psy_supabase_spark.functions.quality import compression_flags

    import random

    rng = random.Random(7)
    noise = "".join(chr(rng.randint(0x4E00, 0x9FFF)) for _ in range(1500))
    sentences = [
        f"sentence number {i} talks about {w} in a slightly different way"
        for i, w in enumerate(["rivers", "markets", "planets", "music", "bread",
                               "glaciers", "engines", "poems", "harbors", "maps"])
    ]
    rows = [
        (1, "spam " * 400),            # pure repetition -> ratio ~0.01
        (2, ". ".join(sentences)),     # varied prose, > 500 bytes (ratio ~0.22)
        (3, noise),                    # high-entropy unicode -> ratio ~0.73
        (4, ""),                       # empty -> NULL ratio, abstain
        (5, "short but random qz9#"),  # under min_len -> abstain
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["c"]
        for r in df.select("doc_id", compression_flags("text").alias("c")).collect()
    }
    assert out[1]["too_repetitive"] and not out[1]["passes"]
    assert out[2]["passes"] and 0.1 <= out[2]["ratio"] <= 0.7
    assert out[3]["too_random"] and not out[3]["passes"]
    assert out[4]["ratio"] is None and out[4]["passes"]
    assert out[5]["passes"]  # length abstention


def test_compression_ratio_deterministic(spark):
    from psy_supabase_spark.functions.quality import compression_ratio

    df = spark.createDataFrame([(i, f"text body {i} " * 30) for i in range(50)], "doc_id long, text string")
    a = {r["doc_id"]: r["r"] for r in df.select("doc_id", compression_ratio("text").alias("r")).collect()}
    b = {r["doc_id"]: r["r"] for r in df.repartition(16).select("doc_id", compression_ratio("text").alias("r")).collect()}
    assert a == b
