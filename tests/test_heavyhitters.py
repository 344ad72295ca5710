"""Heavy-hitters (exact top-k token frequency) — MG-candidates + exact
recount vs the declarative baseline vs a DuckDB oracle, plus the
exactness-certificate valves."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import heavyhitters as hh
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x != '')"


def _rows(df):
    return [(r.token, r.cnt) for r in df.collect()]


def test_exact_matches_duckdb(spark):
    docs = load_table(spark, SF, "documents")
    got = _rows(hh.top_tokens_exact(docs, 25))
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest({TOK}) AS token
              FROM '{SF}/documents.parquet')
        GROUP BY token ORDER BY cnt DESC, token LIMIT 25
        """
    ).fetchall()
    assert got == [(t, int(c)) for t, c in want]


def test_mg_matches_exact_across_capacities(spark):
    """Whenever the certificate passes, the MG path must be row-identical
    to the declarative baseline — including order and tie-breaks."""
    docs = load_table(spark, SF, "documents")
    exact = _rows(hh.top_tokens_exact(docs, 20))
    for cap in (64, 512, 4096):
        assert _rows(hh.top_tokens(docs, 20, capacity=cap)) == exact, cap


def test_auto_route_picks_and_matches_exact(spark):
    """r7 verdict #5: top_tokens_auto must not silently pay MG's two-scan
    premium on a small-vocab corpus — and whichever route it picks, the
    rows must equal the declarative baseline (both plans are exact)."""
    docs = load_table(spark, SF, "documents")
    # unigrams over the ~31-word synthetic vocab: tiny distinct count →
    # the crossover must choose the single-scan plan
    assert hh.route_top_tokens(docs, ngram=1) == "exact"
    got, route = hh.top_tokens_auto(docs, 20)
    assert route == "exact"
    assert _rows(got) == _rows(hh.top_tokens_exact(docs, 20))
    # forcing the spill threshold under the ~16k-distinct trigram space
    # exercises the mg branch, and auto_grow (1k→4k→16k) still certifies
    assert hh.route_top_tokens(docs, ngram=3, mg_min_distinct=1e3) == "mg"
    got_mg, route_mg = hh.top_tokens_auto(
        docs, 5, capacity=1024, ngram=3, mg_min_distinct=1e3
    )
    assert route_mg == "mg"
    assert _rows(got_mg) == _rows(hh.top_tokens_exact(docs, 5, ngram=3))
    # empty corpus: route degenerates cleanly
    assert hh.route_top_tokens(docs.limit(0)) == "exact"


def test_large_candidate_list_takes_broadcast_join(spark, monkeypatch):
    """ADVICE r7: above _ISIN_LITERAL_CUTOFF pruned candidates, the exact
    recount must semi-join a broadcast frame instead of building a 100k+
    literal In expression — same rows either way (pinned here by forcing
    the cutoff to 0 so every candidate list takes the join strategy)."""
    docs = load_table(spark, SF, "documents")
    exact = _rows(hh.top_tokens_exact(docs, 20))
    monkeypatch.setattr(hh, "_ISIN_LITERAL_CUTOFF", 0)
    assert _rows(hh.top_tokens(docs, 20, capacity=4096)) == exact


def test_certificate_raises_not_approximates(spark):
    """A capacity too small for the stream must raise, never return a
    silently-wrong top-k (the sf0.01 corpus has ~50k tokens with a flat
    frequency profile, so capacity 8 provably cannot certify)."""
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError, match="certificate"):
        hh.top_tokens(docs, 20, capacity=8)


def test_small_vocab_and_empty(spark):
    """Vocabulary smaller than k: both paths return the full (short)
    ranking; empty input returns an empty frame with the right schema."""
    docs = load_table(spark, SF, "documents").limit(2)
    exact = _rows(hh.top_tokens_exact(docs, 500))
    assert 0 < len(exact) < 500
    assert _rows(hh.top_tokens(docs, 500, capacity=4096)) == exact

    empty = hh.top_tokens(docs.limit(0), 5)
    assert empty.columns == ["token", "cnt"]
    assert empty.count() == 0


def test_skewed_stream_small_capacity(spark):
    """A genuinely skewed stream certifies at tiny capacity — the case MG
    exists for: the heavy tokens dominate, so candidates survive and the
    k-th count clears the subtracted mass."""
    rows = [("alpha " * 50,)] * 40 + [("beta " * 30,)] * 20 + [
        (f"rare{i} filler words here",) for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "text string").repartition(8)
    got = _rows(hh.top_tokens(docs, 2, capacity=16))
    assert got == [("alpha", 2000), ("beta", 600)]


def test_ngram_units_match_duckdb_and_mg(spark):
    """Bigram heavy hitters: declarative baseline matches a DuckDB bigram
    oracle, and the MG path matches the baseline (the n-gram space is
    ~|vocab|² so the summary genuinely prunes here)."""
    docs = load_table(spark, SF, "documents")
    exact = _rows(hh.top_tokens_exact(docs, 15, ngram=2))
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT token, count(*) AS cnt FROM (
          SELECT unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS token
          FROM (SELECT {TOK} AS toks FROM '{SF}/documents.parquet')
        ) GROUP BY token ORDER BY cnt DESC, token LIMIT 15
        """
    ).fetchall()
    assert exact == [(t, int(c)) for t, c in want]
    assert _rows(hh.top_tokens(docs, 15, capacity=4096, ngram=2)) == exact


def test_mg_summary_shuffle_is_bounded(spark):
    """The candidate pass emits ≤ capacity+2 rows per partition (the MG
    contract that makes the shuffle O(cap·P) instead of vocabulary-wide)."""
    docs = load_table(spark, SF, "documents").repartition(4)
    per_part = (
        hh.mg_candidates(docs, capacity=32)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert per_part and all(r["count"] <= 34 for r in per_part)
