"""Stupid-Backoff bigram LM: hand-computed scores, backoff/OOV terms,
cap degradation, filter semantics, plan shape (operators/lm)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def tiny(spark):
    # corpus: "a b" x2, "a c", "b" — unigrams a:3 b:3 c:1 (N=7),
    # bigrams (a,b):2 (a,c):1
    return _docs(
        spark,
        [(0, "a b"), (1, "a b"), (2, "a c"), (3, "b")],
    )


def test_hand_computed_scores(spark, tiny):
    model = lm.train_bigram_lm(tiny)
    out = {r["doc_id"]: r for r in lm.score_documents(tiny, model).collect()}
    # doc 0/1: one bigram (a,b): ln(2/3)
    expect_ab = round(round(math.log(2 / 3), 6) / 1, 6)
    assert out[0]["n_bigrams"] == 1 and out[0]["avg_logprob"] == expect_ab
    assert out[1]["avg_logprob"] == expect_ab
    # doc 2: (a,c): ln(1/3)
    assert out[2]["avg_logprob"] == round(round(math.log(1 / 3), 6), 6)
    # doc 3: single token — no bigrams, NULL score
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logprob"] is None
    # ppl = exp(-avg)
    assert out[0]["ppl"] == round(math.exp(-expect_ab), 6)


def test_backoff_and_oov_terms(spark, tiny):
    model = lm.train_bigram_lm(tiny)
    # "b a": bigram (b,a) unseen -> backoff alpha*c(a)/N = .4*3/7
    # "a z": (a,z) unseen, z OOV -> alpha*1/N
    probe = _docs(spark, [(10, "b a"), (11, "a z")])
    out = {r["doc_id"]: r["avg_logprob"] for r in lm.score_documents(probe, model).collect()}
    assert out[10] == round(round(math.log(0.4 * 3 / 7), 6), 6)
    assert out[11] == round(round(math.log(0.4 * 1 / 7), 6), 6)


def test_caps_degrade_to_backoff_not_error(spark, tiny):
    # bigram_cap=1 keeps only (a,b); (a,c) must fall back to the backoff
    # term instead of erroring, and the model marks itself bounded
    model = lm.train_bigram_lm(tiny, vocab_cap=2, bigram_cap=1)
    assert model.bounded
    assert model.bigrams.count() == 1 and model.unigrams.count() == 2
    out = {r["doc_id"]: r["avg_logprob"] for r in lm.score_documents(tiny, model).collect()}
    # vocab_cap=2 keeps a,b (count 3 each); c capped out -> OOV floor
    assert out[2] == round(round(math.log(0.4 * 1 / 7), 6), 6)
    # capped model total keeps the TRUE denominator (computed pre-cap)
    assert model.total == 7


def test_scores_independent_of_partitioning(spark, tiny):
    model = lm.train_bigram_lm(tiny)
    one = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.score_documents(tiny.coalesce(1), model).collect()
    }
    many = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.score_documents(tiny.repartition(16), model).collect()
    }
    assert one == many


def test_ppl_filter_drops_tail(spark, tiny):
    model = lm.train_bigram_lm(tiny)
    # gibberish doc scores at the OOV floor -> huge ppl -> dropped
    corpus = tiny.union(_docs(spark, [(99, "zq xv qqj wv")]))
    scored = {r["doc_id"]: r["ppl"] for r in lm.score_documents(corpus, model).collect()}
    cut = (scored[0] + scored[99]) / 2
    kept = {r["doc_id"] for r in lm.ppl_filter(corpus, model, max_ppl=cut).collect()}
    assert 99 not in kept and {0, 1, 2}.issubset(kept)
    assert 3 in kept  # unscored single-token doc kept by default
    kept_strict = {
        r["doc_id"]
        for r in lm.ppl_filter(corpus, model, max_ppl=cut, keep_unscored=False).collect()
    }
    assert 3 not in kept_strict


def test_bounded_model_broadcasts_in_plan(spark, tiny):
    model = lm.train_bigram_lm(tiny, vocab_cap=100, bigram_cap=100)
    plan = lm.score_documents(tiny, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_and_whitespace_docs(spark):
    docs = _docs(spark, [(0, ""), (1, "   "), (2, "x y")])
    model = lm.train_bigram_lm(docs)
    out = {r["doc_id"]: r for r in lm.score_documents(docs, model).collect()}
    assert out[0]["n_bigrams"] == 0 and out[0]["avg_logprob"] is None
    assert out[1]["n_bigrams"] == 0
    assert out[2]["n_bigrams"] == 1


def test_score_covers_every_doc_in_one_scan(spark, tiny, tmp_path):
    """r15 opt: zero-bigram docs ride the outer-exploded relation itself
    (explode_outer's trailing/NULL rows), replacing the old re-scan of
    docs + LEFT join back on id.  Pin the contract — every input doc
    appears exactly once, zero-bigram docs with (0, NULL) — and the
    shape: scoring a parquet input against a local-corpus model reads
    the parquet exactly ONCE (the old spelling read it twice)."""
    model = lm.train_bigram_lm(tiny)  # LocalTableScan model — no parquet
    src = str(tmp_path / "docs")
    _docs(spark, [(0, "a b"), (1, "b"), (2, ""), (3, "a c a")]).write.parquet(src)
    docs = spark.read.parquet(src)
    out = lm.score_documents(docs, model)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[1]["n_bigrams"] == 0 and rows[1]["avg_logprob"] is None
    assert rows[2]["n_bigrams"] == 0 and rows[2]["avg_logprob"] is None
    assert rows[0]["n_bigrams"] == 1 and rows[3]["n_bigrams"] == 2
    # AdaptiveSparkPlan.toString() prints BOTH the final and the initial
    # plan; count scans in the final section only
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan parquet") == 1


def test_duckdb_oracle_parity_sf0001(spark):
    import duckdb

    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = lm.train_bigram_lm(docs)
    sp = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm.score_documents(docs, model).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x != '')"
    sql = (
        f"WITH toks_all AS (SELECT doc_id, {toks} AS t FROM documents),"
        + lm.stupid_backoff_sql()
        + " SELECT * FROM lm_scored"
    )
    du = {int(r[0]): (int(r[1]), float(r[2])) for r in con.sql(sql).fetchall()}
    assert {k: v for k, v in sp.items() if v[0] > 0} == du


def test_stream_twin_matches_batch_scores(spark):
    """score_stream (stateless Arrow UDF twin) == score_documents
    (distributed joins) bit-for-bit on the real corpus."""
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = lm.train_bigram_lm(docs, vocab_cap=100_000, bigram_cap=1_000_000)
    batch = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.score_documents(docs, model).collect()
    }
    twin = {
        r["doc_id"]: r["avg_logprob"]
        for r in lm.score_stream(docs, lm.collect_model(model)).collect()
    }
    assert twin == batch


def test_stream_twin_runs_on_readstream(spark, tmp_path):
    """The twin is admissible on a readStream frame and drains to the
    batch answer (the admission-pipeline composition contract)."""
    from psy_supabase_spark.sources.catalog import load_table

    ref = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = lm.collect_model(lm.train_bigram_lm(ref, vocab_cap=100_000, bigram_cap=1_000_000))

    src = str(tmp_path / "src")
    docs = _docs(spark, [(1, "a b c"), (2, ""), (3, "the cat sat")])
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = lm.score_stream(stream, model)
    q = (
        out.writeStream.format("memory")
        .queryName("lm_admission")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in spark.sql("SELECT * FROM lm_admission").collect()
    }
    want = {
        r["doc_id"]: r["avg_logprob"] for r in lm.score_stream(docs, model).collect()
    }
    assert got == want and set(got) == {1, 2, 3}


def test_collect_model_refuses_unbounded_blowup(spark, tiny):
    model = lm.train_bigram_lm(tiny)
    with pytest.raises(ValueError, match="max_rows"):
        lm.collect_model(model, max_rows=2)


def test_ppl_buckets_terciles(spark):
    from psy_supabase_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    model = lm.train_bigram_lm(docs)
    scored = lm.score_documents(docs, model)
    bucketed, (lo, hi) = lm.ppl_buckets(scored)
    assert lo <= hi
    counts = {r["ppl_bucket"]: r["n"] for r in bucketed.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"head", "middle", "tail", "unscored"}
    n = sum(counts.values())
    # terciles: each real bucket holds roughly a third (approx quantile)
    for b in ("head", "middle", "tail"):
        assert counts.get(b, 0) > 0.2 * n
    # buckets respect the returned thresholds exactly
    mx_head = bucketed.where(F.col("ppl_bucket") == "head").agg(F.max("ppl")).head()[0]
    mn_tail = bucketed.where(F.col("ppl_bucket") == "tail").agg(F.min("ppl")).head()[0]
    assert mx_head <= lo < hi < mn_tail


def test_stream_twin_parity_on_unicode_edge_cases(spark):
    """Java and Python disagree on some unicode lower/regex semantics
    (dotted-I, sharp-s, combining marks) — pin that the twin matches the
    batch path on a corpus of nasty strings, not just ASCII."""
    nasty = [
        "İstanbul I ı İ",            # Turkish dotted/dotless I
        "STRASSE straße ß",          # sharp s
        "naïve café résumé",          # combining-capable accents
        "ｆｕｌｌｗｉｄｔｈ ａｂｃ",   # fullwidth latin
        "数字123と漢字 mixed ascii",   # CJK + digits
        "emoji 🎉 party 🎉 emoji",
        "a'b don't 'quoted' ''",
        "tabs\tand\nnewlines\r\nmix a b",
        "ZÆRO Øre Åre højt",
        "ДВА слова по-русски a b",
    ]
    docs = _docs(spark, list(enumerate(nasty)))
    model = lm.train_bigram_lm(docs)
    batch = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm.score_documents(docs, model).collect()
    }
    twin_df = lm.score_stream(docs, lm.collect_model(model))
    twin = {r["doc_id"]: r["avg_logprob"] for r in twin_df.collect()}
    for k, (n, score) in batch.items():
        assert twin[k] == score, (k, nasty[k], n, score, twin[k])


def test_ppl_buckets_all_null_scores(spark):
    """r14 review: approxQuantile returns [] when every score is null
    (all docs < 2 tokens) — everything buckets 'unscored' with NaN
    thresholds instead of an unpacking crash."""
    model = lm.train_bigram_lm(
        spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    )
    scored = lm.score_documents(
        spark.createDataFrame([(1, "word"), (2, "")], "doc_id long, text string"),
        model,
    )
    out, (lo, hi) = lm.ppl_buckets(scored, score_col="avg_logprob")
    assert {r.ppl_bucket for r in out.collect()} == {"unscored"}
    assert math.isnan(lo) and math.isnan(hi)
