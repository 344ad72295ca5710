"""Benchmark decontamination: overlap semantics (any shared n-gram
flags; n-1 does not), short-doc whole-text rule, DuckDB-oracle parity of
the generalized gram CASE, and the broadcast/no-corpus-shuffle plan."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from psy_supabase_spark.operators import decontam

CORPUS = [
    # 0: contains the benchmark snippet verbatim (tokens 3..10 of it)
    (0, "alpha beta the quick brown fox jumps over the lazy dog tonight"),
    # 1: shares only a 7-token run with the benchmark -> clean at n=8
    (1, "quick brown fox jumps over the lazy cat instead of a dog"),
    # 2: no overlap at all
    (2, "completely unrelated text about database query planners here"),
    # 3: short doc (< 8 tokens), equal to no benchmark whole-text
    (3, "tiny document"),
]
BENCH = [("the quick brown fox jumps over the lazy dog",)]  # 9 tokens


def _dfs(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return corpus, bench


def test_any_shared_ngram_flags_and_n_minus_one_does_not(spark):
    corpus, bench = _dfs(spark)
    flagged = sorted(
        r.doc_id for r in decontam.contaminated_ids(corpus, bench, n=8).collect()
    )
    assert flagged == [0]
    clean = sorted(r.doc_id for r in decontam.decontaminate(corpus, bench, n=8).collect())
    assert clean == [1, 2, 3]
    # at n=7 the 7-token run in doc 1 becomes contaminating
    assert sorted(
        r.doc_id for r in decontam.contaminated_ids(corpus, bench, n=7).collect()
    ) == [0, 1]


def test_short_doc_whole_text_rule(spark):
    corpus = spark.createDataFrame(
        [(0, "tiny document"), (1, "tiny document plus more")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("Tiny DOCUMENT",)], "text string")
    # benchmark is itself short -> whole-text gram; matches doc 0 exactly
    # (case-folded), not doc 1 (longer, different 8-gram universe)
    assert sorted(
        r.doc_id for r in decontam.contaminated_ids(corpus, bench, n=8).collect()
    ) == [0]


def test_gram_rows_match_duckdb_case(spark):
    corpus, _ = _dfs(spark)
    got = sorted(
        (r.id, r.gram)
        for r in decontam.token_ngram_rows(corpus, 8).distinct().collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE c AS SELECT * FROM (VALUES " +
                ", ".join("(%d, '%s')" % (i, t) for i, t in CORPUS) + ") v(doc_id, text)")
    want = sorted(
        con.execute(
            "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9'']+'), x -> x != '') AS t FROM c) "
            f"SELECT DISTINCT doc_id, unnest({decontam.ngram_case_sql(8)}) AS gram FROM toks"
        ).fetchall()
    )
    assert got == want


def test_plan_broadcasts_benchmark_and_keeps_corpus_map_side(spark):
    import re as _re

    corpus, bench = _dfs(spark)
    flagged = decontam.contaminated_ids(corpus, bench, n=8)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    # the benchmark side broadcasts into a LeftSemi probe (the optimizer
    # pushes it through the corpus Union, so it appears per branch)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the corpus side must never hit a shuffle or non-broadcast join:
    # every hash-partitioned Exchange is either the tiny benchmark gram
    # distinct (gram key) or the final matched-id distinct (doc_id/id) —
    # nothing shuffles at corpus-text width
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    keys = _re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert keys and set(keys) <= {"gram", "doc_id", "id"}, keys


def test_flag_twin_matches_anti_join_on_corpus(spark):
    """flag_contaminated (stream-safe, per-row array probe) must agree
    with contaminated_ids (batch hash-probe) doc for doc — including on
    the real corpus with a slice-built benchmark."""
    corpus, bench = _dfs(spark)
    for n in (7, 8):
        want = {r.doc_id for r in decontam.contaminated_ids(corpus, bench, n).collect()}
        got = {
            r.doc_id
            for r in decontam.flag_contaminated(corpus, bench, n).collect()
            if r.is_contaminated
        }
        assert got == want
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9']+", " ")), " "
    )
    bench2 = docs.where(F.col("doc_id") % 97 == 0).select(
        F.array_join(F.slice(arr, 4, 18), " ").alias("text")
    )
    want = {r.doc_id for r in decontam.contaminated_ids(docs, bench2, 8).collect()}
    got = {
        r.doc_id
        for r in decontam.flag_contaminated(docs, bench2, 8).collect()
        if r.is_contaminated
    }
    assert got == want and want  # non-empty: the planted snippets flag


def test_fuzzed_gram_parity_with_duckdb(spark):
    """Seeded fuzz: random token-salad texts (tiny alphabet, empties,
    punctuation runs) — token_ngram_rows must equal the DuckDB gram CASE
    at n=2 and n=8, including short-doc and empty-doc rules."""
    import random

    rng = random.Random(20260814)
    words = ["a", "bb", "ccc", "o'k", "Z", "42", "-", "..", ""]
    texts = []
    for _ in range(120):
        k = rng.randint(0, 12)
        texts.append(" ".join(rng.choice(words) for _ in range(k)))
    corpus = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    con = duckdb.connect()
    con.execute("CREATE TABLE c (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(texts)))
    for n in (2, 8):
        got = sorted(
            (r.id, r.gram)
            for r in decontam.token_ngram_rows(corpus, n).distinct().collect()
        )
        want = sorted(
            con.execute(
                "WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
                "'[^a-z0-9'']+'), x -> x != '') AS t FROM c) "
                f"SELECT DISTINCT doc_id, unnest({decontam.ngram_case_sql(n)}) AS gram FROM toks"
            ).fetchall()
        )
        assert got == want, n
