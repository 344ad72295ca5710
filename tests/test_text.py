"""Text-pack semantics: first-match-wins CASE ordering, clean_text
idempotence, term-overlap bounds, taxonomy argmax default + tie-break."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.functions import text as TX
from psy_supabase_spark.operators import textanalysis


def _one(spark, text: str, expr) -> object:
    return spark.createDataFrame([(text,)], "text string").select(expr.alias("v")).head().v


def test_safety_first_match_wins(spark):
    # 'kill myself' matches suicide before self_harm patterns could
    assert _one(spark, "I want to kill myself", TX.safety_category("text")) == "suicide"
    assert _one(spark, "I keep cutting myself", TX.safety_category("text")) == "self_harm"
    assert _one(spark, "a calm sentence", TX.safety_category("text")) is None


def test_safety_severity(spark):
    row = _one(spark, "thinking about suicide", TX.safety_struct("text"))
    assert row.category == "suicide" and row.severity == "critical"


def test_template_first_match_wins(spark):
    # 'how' (Question) wins over 'feel' (Empathy) even when both present
    assert _one(spark, "How do you feel", TX.select_template("text")) == "Question"
    assert _one(spark, "I feel alone", TX.select_template("text")) == "Empathy and Validation"
    assert _one(spark, "zzz", TX.select_template("text")) == "Others"


def test_clean_text_idempotent(spark):
    dirty = 'He said “hi” — visit https://x.io… now\t\tok'
    once = _one(spark, dirty, TX.clean_text("text"))
    twice = _one(spark, once, TX.clean_text("text"))
    assert once == twice
    assert "“" not in once and "\t" not in once


def test_strip_urls(spark):
    assert _one(spark, "see https://a.b/c and www.d.e f", TX.strip_urls("text")) == "see  and  f"


def test_term_overlap_bounds(spark):
    df = spark.createDataFrame([("a b c", "a b c"), ("a b", "x y"), ("", "a")], "q string, r string")
    rows = df.select(TX.term_overlap("q", "r").alias("o")).collect()
    assert rows[0].o == 1.0
    assert rows[1].o == 0.0
    assert rows[2].o is None  # empty question → NULL, not div-by-zero


def test_length_buckets(spark):
    assert _one(spark, "short one", TX.length_bucket("text")) == "too_short"
    assert _one(spark, " ".join(["w"] * 100), TX.length_bucket("text")) == "appropriate"
    assert _one(spark, " ".join(["w"] * 501), TX.length_bucket("text")) == "too_long"


def test_template_adherence(spark):
    df = spark.createDataFrame(
        [("Question", "is it so?"), ("Empathy and Validation", "I understand you"), ("Question", "no")],
        "template string, response string",
    )
    got = [r.a for r in df.select(TX.template_adherence("template", "response").alias("a")).collect()]
    assert got == ["high", "high", "medium"]


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here", TX.lang_id("text")) == "en"
    assert _one(spark, "der hund und die katze ist", TX.lang_id("text")) == "de"
    assert _one(spark, "zzz qqq", TX.lang_id("text")) == "und"


def test_topic_argmax_default_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "I am anxious and panic a lot"),        # anxiety (2 hits)
            (2, "nothing matches here"),                 # default
            (3, "anxious and depressed"),                # 1-1 tie → 'anxiety' < 'depression'
        ],
        "doc_id long, text string",
    )
    tax = textanalysis.taxonomy_table(docs.sparkSession)
    got = {r.doc_id: r.topic for r in textanalysis.classify_topics(docs, tax).collect()}
    assert got[1] == "anxiety"
    assert got[2] == "emotional_support"
    assert got[3] == "anxiety"


def test_fingerprint_deterministic_and_distinct(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "hello world"), (3, "other")], "doc_id long, text string")
    rows = textanalysis.fingerprint(df).collect()
    fp = {r.doc_id: r.fingerprint for r in rows}
    assert fp[1] == fp[2] != fp[3]
    assert all(0 <= v < 2_147_483_647 for v in fp.values())


@pytest.mark.parametrize("text,expected", [("", 0), ("a b  c", 3)])
def test_token_count(spark, text, expected):
    assert _one(spark, text, TX.token_count("text")) == expected


def test_quality_score_range(spark, sf_dir):
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(TX.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).head()
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_corpus_report_rollup(spark):
    from psy_supabase_spark.operators.textanalysis import corpus_report
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rep = corpus_report(docs).collect()
    total = [r for r in rep if r["lang"] is None and r["source"] is None]
    assert len(total) == 1 and total[0]["n_docs"] == docs.count()
    # lang subtotals sum to the grand total
    lang_rows = [r for r in rep if r["lang"] is not None and r["source"] is None]
    assert sum(r["n_docs"] for r in lang_rows) == total[0]["n_docs"]
    assert sum(r["n_tokens"] for r in lang_rows) == total[0]["n_tokens"]
    # leaf rows sum within each lang
    for lr in lang_rows:
        leaves = [
            r for r in rep if r["lang"] == lr["lang"] and r["source"] is not None
        ]
        assert sum(r["n_docs"] for r in leaves) == lr["n_docs"]
    # rates are rates
    assert all(0.0 <= r["gopher_pass_rate"] <= 1.0 for r in rep)


def test_s_stem_rule_cascade(spark):
    """Harman 1991 three-rule S-stemmer: hand-computed expectations,
    including every exception class and the first-rule-wins ordering."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.functions import text as TX

    cases = {
        "studies": "study",     # rule 1
        "aies": "aie",          # rule-1 exception -> falls to rule 2
        "eies": "eie",          # rule-1 exception -> falls to rule 2
        "churches": "churche",  # rule 2 (es -> e)
        "shoes": "shoe",        # rule-2 exception (oes) -> rule 3 drops s
        "cats": "cat",          # rule 3
        "bus": "bus",           # rule-3 exception (us)
        "glass": "glass",       # rule-3 exception (ss)
        "dog": "dog",           # no rule
        "s": "",                # bare s drops
    }
    df = spark.createDataFrame([(w,) for w in cases], "tok string")
    got = {r.tok: r.stem for r in df.select("tok", TX.s_stem(F.col("tok")).alias("stem")).collect()}
    assert got == cases

    # DuckDB twin is the identical cascade
    import duckdb

    for w, want in cases.items():
        sql = TX.s_stem_sql(f"'{w}'")
        assert duckdb.sql(f"SELECT {sql}").fetchone()[0] == want, w
