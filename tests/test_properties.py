"""Property-based invariants (SURVEY.md §5.3), hypothesis-generated.

One shared SparkSession; each property materializes a small DataFrame per
example, so examples are capped to keep runtime sane."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from psy_supabase_spark.functions import text as TX
from psy_supabase_spark.functions import vector as V
from psy_supabase_spark.operators import topk

SLOW = settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))

finite_floats = st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False)
vectors = st.lists(finite_floats, min_size=2, max_size=8)
texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs", "Cc"]), max_size=120
)


@SLOW
@given(v=vectors)
def test_self_similarity_is_one(spark, v):
    df = spark.createDataFrame([(v,)], "e array<double>")
    out = df.select(V.cosine_similarity("e", "e").alias("s")).head().s
    # subnormal components square-underflow to 0 — the zero-norm guard
    # then correctly yields NULL (the reference's NumPy would emit nan)
    if sum(x * x for x in v) == 0.0:
        assert out is None
    else:
        assert out == pytest.approx(1.0, abs=1e-9)


@SLOW
@given(a=vectors, b=vectors)
def test_cosine_symmetric_and_bounded(spark, a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        V.cosine_similarity("a", "b").alias("ab"), V.cosine_similarity("b", "a").alias("ba")
    ).head()
    if row.ab is not None:
        assert row.ab == pytest.approx(row.ba, abs=1e-12)
        assert -1.0 - 1e-9 <= row.ab <= 1.0 + 1e-9


@SLOW
@given(vs=st.lists(st.tuples(st.integers(0, 1 << 30), vectors), min_size=1, max_size=8))
def test_topk_stable_under_permutation(spark, vs):
    dim = len(vs[0][1])
    rows = [(i, v[:dim] + [0.0] * (dim - len(v))) for i, (_, v) in enumerate(vs)]
    q = rows[0][1]
    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df2 = spark.createDataFrame(list(reversed(rows)), "vec_id long, embedding array<double>")
    r1 = [(r.vec_id, r.similarity) for r in topk.topk_similarity(df1, q, k=3).collect()]
    r2 = [(r.vec_id, r.similarity) for r in topk.topk_similarity(df2, q, k=3).collect()]
    assert r1 == r2


@SLOW
@given(t=texts)
def test_clean_text_idempotent(spark, t):
    df = spark.createDataFrame([(t,)], "text string")
    once = df.select(TX.clean_text("text").alias("c")).head().c
    twice = spark.createDataFrame([(once,)], "text string").select(
        TX.clean_text("text").alias("c")
    ).head().c
    assert once == twice


@SLOW
@given(t=texts)
def test_token_count_matches_tokenize_upper_bound(spark, t):
    df = spark.createDataFrame([(t,)], "text string")
    row = df.select(
        TX.token_count("text").alias("n"), F.size(TX.tokenize("text")).alias("m")
    ).head()
    assert row.n >= 0 and row.m >= 0


@SLOW
@given(
    d=st.dictionaries(
        # word-char keys: get_json_object's $['k'] path syntax can't quote
        # quotes/backslashes — a path-language limit, not engine logic
        st.text(st.characters(codec="ascii", categories=["L", "N"]), min_size=1, max_size=8),
        st.integers(-1000, 1000),
        max_size=4,
    )
)
def test_json_roundtrip_identity(spark, d):
    import json

    s = json.dumps(d)
    df = spark.createDataFrame([(s,)], "j string")
    for k, v in d.items():
        got = df.select(F.get_json_object("j", f"$['{k}']").alias("v")).head().v
        assert got == str(v)


def test_domain_weighted_sample_is_nested_and_exact(spark):
    """Raising a domain's rate only ADDS docs (nested samples) and the
    realized per-domain counts equal the exact hash-threshold counts."""
    from psy_supabase_spark.functions.hashing import md5_hash32
    from psy_supabase_spark.queries.misc_queries import deterministic_sample
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = deterministic_sample(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    h = md5_hash32(F.col("doc_id").cast("string")) % 100
    for rate in (10, 25, 60):
        inner = {r.doc_id for r in docs.where(h < rate).select("doc_id").collect()}
        outer = {r.doc_id for r in docs.where(h < rate + 20).select("doc_id").collect()}
        assert inner <= outer  # nested: same hash, higher threshold
    # realized sample == exact per-row predicate (no approximation)
    got = {(r.doc_id, r.domain_rate) for r in out.collect()}
    want = {
        (r.doc_id, r.rate)
        for r in docs.withColumn(
            "rate",
            F.coalesce(
                F.element_at(
                    F.create_map(
                        F.lit("en"), F.lit(60), F.lit("es"), F.lit(25),
                        F.lit("fr"), F.lit(25), F.lit("de"), F.lit(25),
                    ),
                    F.col("lang"),
                ),
                F.lit(10),
            ),
        ).where(h < F.col("rate")).select("doc_id", "rate").collect()
    }
    assert got == want
