"""DSIR importance resampling — DuckDB bit-parity for features, ratios,
log-weights and Gumbel-top-k selection, plus sanity on the direction of
the weights (docs resembling the target score higher)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from psy_supabase_spark.operators import dsir
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), x -> x != '')"
B = 512  # small bucket space: forces collisions, the regime hashing is for

_GRAMS_CTE = f"""
base AS (SELECT doc_id, lang, {TOK} AS toks FROM '{SF}/documents.parquet'),
grams AS (
  SELECT doc_id, lang,
         unnest(toks || [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS gram
  FROM base),
feats AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % {B} AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY doc_id, lang, bucket)
"""


def _oracle_logweights():
    con = duckdb.connect()
    return con.sql(
        f"""
        WITH {_GRAMS_CTE},
        tc AS (SELECT bucket, sum(cnt) AS c FROM feats WHERE lang = 'en' GROUP BY bucket),
        rc AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY bucket),
        tt AS (SELECT sum(c) AS t FROM tc), rt AS (SELECT sum(c) AS t FROM rc),
        ratio AS (
          SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
                 round(ln((COALESCE(tc.c, 0) + 1.0) / ((SELECT t FROM tt) + {B}))
                       - ln((COALESCE(rc.c, 0) + 1.0) / ((SELECT t FROM rt) + {B})), 6) AS lr
          FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
        lw AS (SELECT f.doc_id,
                      CAST(sum(f.cnt * CAST(r.lr AS DECIMAL(20,6))) AS DOUBLE) AS w
               FROM feats f JOIN ratio r USING (bucket) GROUP BY f.doc_id)
        SELECT d.doc_id, COALESCE(lw.w, 0.0) AS w
        FROM '{SF}/documents.parquet' d LEFT JOIN lw USING (doc_id)
        """
    ).fetchall()


def test_logweights_match_duckdb(spark):
    docs = load_table(spark, SF, "documents")
    target = docs.where(F.col("lang") == "en")
    got = sorted(
        (r.doc_id, r.dsir_logweight)
        for r in dsir.dsir_logweights(docs, target, n_buckets=B).collect()
    )
    want = sorted((int(a), float(b)) for a, b in _oracle_logweights())
    assert len(got) == 500
    assert got == want


def test_select_matches_duckdb_gumbel_topk(spark):
    docs = load_table(spark, SF, "documents")
    target = docs.where(F.col("lang") == "en")
    got = [
        (r.doc_id, r.dsir_logweight, r.gumbel, r.score)
        for r in dsir.dsir_select(docs, target, 25, seed=7, n_buckets=B).collect()
    ]
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH {_GRAMS_CTE},
        tc AS (SELECT bucket, sum(cnt) AS c FROM feats WHERE lang = 'en' GROUP BY bucket),
        rc AS (SELECT bucket, sum(cnt) AS c FROM feats GROUP BY bucket),
        tt AS (SELECT sum(c) AS t FROM tc), rt AS (SELECT sum(c) AS t FROM rc),
        ratio AS (
          SELECT COALESCE(tc.bucket, rc.bucket) AS bucket,
                 round(ln((COALESCE(tc.c, 0) + 1.0) / ((SELECT t FROM tt) + {B}))
                       - ln((COALESCE(rc.c, 0) + 1.0) / ((SELECT t FROM rt) + {B})), 6) AS lr
          FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),
        lw AS (SELECT f.doc_id,
                      CAST(sum(f.cnt * CAST(r.lr AS DECIMAL(20,6))) AS DOUBLE) AS w
               FROM feats f JOIN ratio r USING (bucket) GROUP BY f.doc_id),
        dense AS (SELECT d.doc_id, COALESCE(lw.w, 0.0) AS w
                  FROM '{SF}/documents.parquet' d LEFT JOIN lw USING (doc_id)),
        g AS (SELECT doc_id, w,
                     round(-ln(-ln((CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                                    % 1000000 + 0.5) / 1000000.0)), 6) AS gum
              FROM dense)
        SELECT doc_id, w, gum,
               CAST(CAST(w AS DECIMAL(20,6)) + CAST(gum AS DECIMAL(20,6)) AS DOUBLE) AS score
        FROM g ORDER BY score DESC, doc_id LIMIT 25
        """
    ).fetchall()
    want = [(int(a), float(b), float(c), float(d)) for a, b, c, d in want]
    assert got == want


def test_weights_point_toward_target(spark):
    """Docs FROM the target domain must average a higher importance
    weight than the rest — the whole point of the estimator."""
    docs = load_table(spark, SF, "documents")
    target = docs.where(F.col("lang") == "en")
    lw = dsir.dsir_logweights(docs, target, n_buckets=B)
    joined = lw.join(docs.select("doc_id", "lang"), "doc_id")
    avg = {
        r.is_t: r.m
        for r in joined.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_feature_space_is_bounded(spark):
    docs = load_table(spark, SF, "documents")
    feats = dsir.hashed_ngram_features(docs, n_buckets=B)
    assert feats.select("bucket").distinct().count() <= B
    assert feats.agg(F.min("bucket")).collect()[0][0] >= 0
