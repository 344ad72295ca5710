"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
NeurIPS, "Data Selection for Language Models via Importance Resampling").

The published recipe for carving a 100 TB raw crawl toward a target
domain: featurize every document as hashed n-gram counts, fit bucket
unigram distributions over the TARGET corpus (p) and the RAW corpus (q),
weight each raw document by its importance ratio
``log w(x) = Σ_b c_b(x) · (log p_b − log q_b)``, then resample k
documents with Gumbel-perturbed top-k (sampling without replacement ∝ w).

Spark-first shapes, no Python on any data path:

- :func:`hashed_ngram_features` — unigram+bigram hashing into
  ``n_buckets`` via the engine's portable md5 hash, one map-side
  explode + (id, bucket) count.  The shuffle is bounded by features per
  doc, the vocabulary never materializes.
- :func:`bucket_logratio` — two bounded groupBys (≤ n_buckets rows
  each), FULL OUTER joined, Laplace-smoothed (α=1), per-bucket
  ``round(ln(p̂_b) − ln(q̂_b), 6)``.  ≤ n_buckets rows → broadcast.
- :func:`dsir_logweights` — broadcast-join features to ratios; the
  per-doc sum multiplies integer counts by the 6-dp ratio in
  DECIMAL(20,6) (the lm.py pattern: exact under ANY partitioning or
  summation order, so the result is reproducible and DuckDB-mirrorable
  bit-for-bit).
- :func:`dsir_select` — Gumbel-top-k: ``g = −ln(−ln(u))`` with
  ``u = (md5_hash32(seed‖id) % 1e6 + 0.5)/1e6`` — fully deterministic,
  portable, and a TakeOrdered plan (no global sort).

100 TB story: raw features dominate and stay (id,bucket)-bounded; both
distribution fits are n_buckets-row aggregates; the scoring join
broadcasts ≤ n_buckets rows; selection is top-k.  Nothing driver-side
grows with the corpus.  No reference analog (psy-supabase has no data
selection); training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash32
from ..functions.text import tokenize
from .heavyhitters import _ngrams_nolambda

__all__ = [
    "hashed_ngram_features",
    "bucket_logratio",
    "dsir_logweights",
    "dsir_select",
]

DEFAULT_BUCKETS = 8192


def hashed_ngram_features(
    docs: DataFrame,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram counts per document —
    the paper's feature map.  Tokens are materialized before the bigram
    zip (the heavyhitters lambda-re-evaluation lesson); the bucket is
    ``md5_hash32(gram) pmod n_buckets`` so any engine with md5 can
    reproduce it."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokenize(text_col).alias("_t")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.concat(F.col("_t"), _ngrams_nolambda(F.col("_t"), 2))
        ).alias("gram"),
    )
    return (
        grams.select("id", F.pmod(md5_hash32("gram"), F.lit(n_buckets)).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _bucket_counts(feats: DataFrame) -> DataFrame:
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("c"))


def bucket_logratio(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, logratio): 6-dp ``ln(p̂_b) − ln(q̂_b)`` with add-one
    smoothing — ``p̂_b = (c_b + 1)/(C + n_buckets)``.  Both sides spell
    the two logs separately (not ln of the quotient), so the oracle can
    reproduce the exact doubles.  ≤ n_buckets rows by construction.

    Each corpus's featurization runs ONCE here: the sketch-sized
    bucket-count frames collect in one job apiece, the totals sum from
    the collected ints, and the joined frame is rebuilt driver-side
    (r14 review: the old spelling ran two extra total-collect jobs and
    left both featurizations inside the returned plan, so the
    downstream scoring action re-featurized the raw corpus a third
    time).  The log/round math stays in CATALYST on the same
    expressions — identical doubles to the old plan and to the SQL
    oracle."""
    from pyspark.sql import types as T

    tc = _bucket_counts(target_feats)
    bucket_field = tc.schema["bucket"]
    tc_rows = tc.collect()
    rc_rows = _bucket_counts(raw_feats).collect()
    t_total = sum(r["c"] for r in tc_rows)
    r_total = sum(r["c"] for r in rc_rows)
    counts: dict = {}
    for r in tc_rows:
        counts[r["bucket"]] = [r["c"], 0]
    for r in rc_rows:
        counts.setdefault(r["bucket"], [0, 0])[1] = r["c"]
    spark = target_feats.sparkSession
    joined = spark.createDataFrame(
        [(b, ct, cr) for b, (ct, cr) in counts.items()],
        T.StructType(
            [
                T.StructField("bucket", bucket_field.dataType, True),
                T.StructField("ct", T.LongType(), True),
                T.StructField("cr", T.LongType(), True),
            ]
        ),
    )
    logp = F.log((F.col("ct") + F.lit(1.0)) / F.lit(float(t_total + n_buckets)))
    logq = F.log((F.col("cr") + F.lit(1.0)) / F.lit(float(r_total + n_buckets)))
    return joined.select("bucket", F.round(logp - logq, 6).alias("logratio"))


def dsir_logweights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, dsir_logweight): per-raw-doc importance log-weight,
    exact under any ordering (integer count × 6-dp ratio summed in
    DECIMAL(20,6), then cast to double).  Feature-less documents score
    0.0 (empty product), keeping every raw doc selectable."""
    raw_feats = hashed_ngram_features(
        raw_docs, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    target_feats = hashed_ngram_features(
        target_docs, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    ratio = bucket_logratio(target_feats, raw_feats, n_buckets=n_buckets)
    term = F.col("cnt") * F.col("logratio").cast("decimal(20,6)")
    scored = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(F.sum(term).cast("double").alias("dsir_logweight"))
    )
    return (
        raw_docs.select(F.col(id_col))
        .join(scored.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("dsir_logweight", F.lit(0.0)).alias("dsir_logweight"),
        )
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    *,
    seed: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k importance resampling: k raw docs drawn without
    replacement with probability ∝ their importance weight — the
    paper's selection step, spelled as deterministic portable-hash
    Gumbel noise + TakeOrdered.  Returns (id_col, dsir_logweight,
    gumbel, score) ordered score DESC, id ASC."""
    lw = dsir_logweights(
        raw_docs,
        target_docs,
        n_buckets=n_buckets,
        text_col=text_col,
        id_col=id_col,
    )
    u = (
        F.pmod(
            md5_hash32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            F.lit(1_000_000),
        )
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    gumbel = F.round(-F.log(-F.log(u)), 6)
    return (
        lw.withColumn("gumbel", gumbel)
        .withColumn(
            "score",
            (
                F.col("dsir_logweight").cast("decimal(20,6)")
                + F.col("gumbel").cast("decimal(20,6)")
            ).cast("double"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
