"""Lexical retrieval over the corpus: BM25 scoring and TF-IDF keyterms.

A training-data pipeline needs keyword retrieval for corpus inspection
("show me docs about X"), targeted decontamination sweeps, and per-doc
topical signatures (keyterm extraction feeds dedup triage and quality
audits).  The reference has no retrieval surface (its search is vector
similarity only, ``database.py``); this module is the lexical complement
to the ANN family, built entirely from declarative DataFrame ops — no
Python on any data path.

Scale story (100 TB):
- :func:`bm25_scores`: the query-term ``isin`` filter lands directly on
  the exploded token stream (codegen, map-side), so the only shuffled
  rows are (doc, matched-term) pairs — bounded by |docs|·|query|, not by
  token volume.  Corpus stats (N, avgdl) are two driver scalars from a
  1-row bounded fetch embedded as literals; per-term document
  frequencies are a |query|-row aggregate joined back via BROADCAST
  hash join on the term; no wide state anywhere.
- :func:`keyterms_tfidf`: three key-bounded shuffles — tf on
  (doc, token), df on token, then a per-doc window top-n — each a plain
  hash partition Catalyst lays out itself; the df side can be capped
  with ``min_df`` to drop hapax noise map-side.

All scores are computed in float64 with the identical association order
both engines spell (ints → one division / log / product), rounded to
6 dp before any ranking, so the SQL oracle mirrors are hash-stable.

BM25 is the Robertson et al. Okapi form (TREC-3, 1994):
``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` and
``score = Σ idf · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = ["bm25_scores", "bm25_topk", "keyterms_tfidf"]


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, dl, token) exploded token stream with per-doc length."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("_toks")
    ).withColumn("dl", F.size("_toks"))
    return toks.select("id", "dl", F.explode("_toks").alias("token"))


def _corpus_stats(docs: DataFrame, text_col: str) -> tuple[int, int]:
    """(n_docs, sum_dl) as driver scalars — a 1-row bounded fetch (the
    same pattern as IVF's centroid collect).  Embedding the two ints as
    literals keeps every downstream expression map-side: a 1-row
    DataFrame joined on a constant key constant-folds into a
    BroadcastNestedLoopJoin, which the plan audit bans."""
    row = (
        docs.select(F.size(tokenize(text_col)).alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl"))
        .collect()[0]
    )
    return int(row.n_docs or 0), int(row.sum_dl or 0)


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Okapi BM25 score for ``query_terms``: one row
    ``(id_col, bm25)`` per document containing ≥1 query term, score
    rounded to 6 dp.  Docs with no match are absent (join back with
    ``coalesce(0.0)`` for a dense column).

    NOTE (oracle determinism): the per-doc score sums one float64 term
    per matched query term.  IEEE addition is commutative, so 2-term
    queries are bit-stable under any aggregation order; longer queries
    are associativity-sensitive in the last ulp — fine for retrieval,
    but pin ≤2 terms for hash-gated mirrors."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    tok = _doc_tokens(docs, text_col, id_col)
    tf = (
        tok.where(F.col("token").isin(terms))
        .groupBy("id", "token")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs, sum_dl = _corpus_stats(docs, text_col)
    if n_docs == 0:
        return docs.limit(0).select(
            F.col(id_col), F.lit(0.0).alias("bm25")
        )
    scored = tf.join(F.broadcast(dfreq), "token")
    avgdl = F.lit(sum_dl).cast("double") / F.lit(n_docs)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return (
        scored.withColumn("_s", idf * tf_part)
        .groupBy("id")
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .select(F.col("id").alias(id_col), "bm25")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k docs by BM25 (DESC), id ASC tie-break — a TakeOrdered plan,
    no global sort materialization."""
    id_col = kwargs.get("id_col", "doc_id")
    return bm25_scores(docs, query_terms, **kwargs).orderBy(
        F.desc("bm25"), F.asc(id_col)
    ).limit(k)


def keyterms_tfidf(
    docs: DataFrame,
    n: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Per-document top-n TF-IDF keyterms: ``(id_col, rank, keyterm,
    tfidf)`` with ``tfidf = (tf/dl) · ln(N/df)`` rounded to 6 dp and
    ranked (score DESC, token ASC) — the deterministic topical signature
    used for corpus audits and dedup triage.

    ``min_df`` drops ultra-rare terms before the df join (hapax
    legomena dominate vocabulary size but can never be corpus-level
    keyterms at scale); the default keeps everything, exact."""
    tok = _doc_tokens(docs, text_col, id_col)
    tf = tok.groupBy("id", "token").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    n_docs, _ = _corpus_stats(docs, text_col)
    if n_docs == 0:
        return docs.limit(0).select(
            F.col(id_col),
            F.lit(1).alias("rank"),
            F.lit("").alias("keyterm"),
            F.lit(0.0).alias("tfidf"),
        )
    score: Column = F.round(
        (F.col("tf").cast("double") / F.col("dl"))
        * F.log(F.lit(n_docs).cast("double") / F.col("df")),
        6,
    )
    ranked = (
        tf.join(dfreq, "token")
        .withColumn("tfidf", score)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("id").orderBy(
                    F.desc("tfidf"), F.asc("token")
                )
            ),
        )
        .where(F.col("rank") <= n)
    )
    return ranked.select(
        F.col("id").alias(id_col), "rank", F.col("token").alias("keyterm"), "tfidf"
    )
