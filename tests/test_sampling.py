"""Sampling/splitting primitives: determinism, nestedness, structural
split disjointness+exhaustiveness, domain-rate arithmetic, and the
pushed-filter plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from psy_supabase_spark.operators import sampling

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_deterministic_and_nested(spark):
    docs = _docs(spark)
    a1 = {r.doc_id for r in sampling.hash_sample(docs, 20).select("doc_id").collect()}
    a2 = {r.doc_id for r in sampling.hash_sample(docs, 20).select("doc_id").collect()}
    assert a1 == a2
    b = {r.doc_id for r in sampling.hash_sample(docs, 50).select("doc_id").collect()}
    assert a1 < b  # strict: 20% nests inside 50%


def test_split_disjoint_exhaustive_and_stable(spark):
    docs = _docs(spark)
    train, val, test = sampling.train_val_test_split(docs, val_pct=10, test_pct=10)
    ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}
    tr, va, te = ids(train), ids(val), ids(test)
    assert not (tr & va) and not (tr & te) and not (va & te)
    assert tr | va | te == ids(docs)
    # growing the corpus must not move existing rows between splits
    half = docs.where(F.col("doc_id") % 2 == 0)
    tr2, va2, te2 = (ids(d) for d in sampling.train_val_test_split(half, val_pct=10, test_pct=10))
    assert tr2 == tr & ids(half) and va2 == va & ids(half) and te2 == te & ids(half)


def test_domain_weighted_rates_apply_per_domain(spark):
    docs = _docs(spark)
    out = sampling.domain_weighted_sample(
        docs, {"en": 100}, default_rate=0, rate_col="r"
    )
    rows = out.select("lang", "r").distinct().collect()
    # rate 0 domains vanish entirely; en keeps everything
    assert {(r.lang, r.r) for r in rows} == {("en", 100)}
    n_en = docs.where(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_sample_predicate_reaches_the_scan(spark):
    docs = _docs(spark)
    plan = sampling.hash_sample(docs, 10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Filter" in plan


def test_query_matches_operator(spark):
    from psy_supabase_spark.queries.misc_queries import (
        DEFAULT_DOMAIN_RATE,
        DOMAIN_RATES,
        deterministic_sample,
    )

    got = {
        (r.doc_id, r.domain_rate)
        for r in deterministic_sample(spark, SF).collect()
    }
    want = {
        (r.doc_id, r.domain_rate)
        for r in sampling.domain_weighted_sample(
            _docs(spark), DOMAIN_RATES, default_rate=DEFAULT_DOMAIN_RATE, rate_col="domain_rate"
        ).select("doc_id", "domain_rate").collect()
    }
    assert got == want


def test_component_safe_split_never_straddles_neardups(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # chains of near-dups: (0,1),(1,2) share a component; (10,11); ...
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 150, 3)]
        + [(i + 1, i + 2) for i in range(0, 150, 3)],
        "id_a long, id_b long",
    )
    train, val, test = sampling.component_safe_split(
        docs, pairs, val_pct=20, test_pct=20
    )
    t = {r.doc_id for r in train.collect()}
    v = {r.doc_id for r in val.collect()}
    s = {r.doc_id for r in test.collect()}
    assert t | v | s == set(range(200)) and not (t & v or t & s or v & s)
    # every 3-chain lands whole in one split
    for base in range(0, 150, 3):
        chain = {base, base + 1, base + 2}
        assert chain <= t or chain <= v or chain <= s, f"chain {chain} straddles"
    # output schema is the input schema (plumbing columns dropped)
    assert train.columns == docs.columns


def test_graded_sample_keep_rate_tracks_score(spark):
    rows = [(i, 0.9) for i in range(500)] + [(1000 + i, 0.1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    kept = sampling.graded_sample(df, "score")
    hi = kept.where(F.col("score") == 0.9).count()
    lo = kept.where(F.col("score") == 0.1).count()
    assert 400 <= hi <= 500 and 20 <= lo <= 200
    # deterministic: same call, same rows
    again = {r.doc_id for r in sampling.graded_sample(df, "score").collect()}
    assert again == {r.doc_id for r in kept.collect()}
    # floor guarantees a minimum keep probability even at score 0
    zeros = spark.createDataFrame([(i, 0.0) for i in range(500)], "doc_id long, score double")
    assert sampling.graded_sample(zeros, "score", floor=0.2).count() > 50
