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
