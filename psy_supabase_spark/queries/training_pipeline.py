"""The LLM-training-data pipeline, end to end, as ONE oracle-gated query:

    documents → exact-dup removal → near-dup removal (n-gram Jaccard)
              → quality gate → language gate → deterministic sample
              → training-format reshape

Every stage is an operator from this engine; the whole composition is a
single lazy DataFrame DAG (one job), and the DuckDB oracle reproduces it
stage for stage — the strongest end-to-end correctness statement the
gate can make.  At 100 TB each stage keeps the scale shape documented in
SCALE.md (inverted-index near-dup join, codegen'd scoring, hash sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.hashing import md5_hash32
from ..operators import dedup
from ..registry import register
from ..sources.catalog import load_table
from .dedup_queries import _CLEAN, _EXACT_JACCARD_SQL
from .text_queries import _stopword_ratio_sql, _WS_COUNT_SQL

_QUALITY_SQL = f"""ROUND((
  (CASE WHEN {_WS_COUNT_SQL} BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
  + (CASE WHEN length(text) = 0 THEN 0.0
          WHEN length(regexp_replace(text, '[^!?.,;:]', '', 'g'))::DOUBLE / length(text) <= 0.1 THEN 1.0
          ELSE 0.0 END)
  + (CASE WHEN {_stopword_ratio_sql()} >= 0.05 THEN 1.0 ELSE 0.0 END)
) / 3.0, 6)"""


@register(
    "training_pipeline",
    oracle=f"""
    WITH neardup_pairs AS ({_EXACT_JACCARD_SQL}),
    exact_keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, lower({_CLEAN.format(col='text')}) AS norm FROM documents)
      GROUP BY norm
    ),
    survivors AS (
      SELECT d.* FROM documents d
      JOIN exact_keepers k ON d.doc_id = k.doc_id
      WHERE d.doc_id NOT IN (SELECT id_b FROM neardup_pairs)
    ),
    gated AS (
      SELECT doc_id, text, lang, source, {_QUALITY_SQL} AS quality
      FROM survivors
      WHERE {_QUALITY_SQL} >= 0.6 AND lang = 'en'
    )
    SELECT doc_id,
           'Summarize the following ' || source || ' document' AS instruction,
           text AS input,
           quality
    FROM gated
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
    """,
)
def training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact + near-dup) → quality/lang gates → 50% hash sample →
    instruction-format reshape, composed from the engine's operators."""
    docs = load_table(spark, sf_dir, "documents")

    # hash_first: the exact-dup stage shuffles (hash, check, id) — ≤48
    # B/row instead of the corpus text — and is row-identical to the
    # text-key spelling (the oracle's GROUP BY norm), incl. collisions
    keepers = dedup.exact_dedup(docs, hash_first=True).select(
        F.col("keeper_id").alias("doc_id")
    )
    neardups = dedup.ngram_jaccard_pairs(docs, 0.5).select(F.col("id_b").alias("doc_id"))
    survivors = docs.join(keepers, "doc_id", "left_semi").join(neardups, "doc_id", "left_anti")

    quality = TX.quality_score(F.col("text"))
    gated = (
        survivors.select("doc_id", "text", "lang", "source", quality.alias("quality"))
        .where((F.col("quality") >= 0.6) & (F.col("lang") == "en"))
    )
    sampled = gated.where(md5_hash32(F.col("doc_id").cast("string")) % 100 < 50)
    return sampled.select(
        "doc_id",
        F.concat(F.lit("Summarize the following "), F.col("source"), F.lit(" document")).alias(
            "instruction"
        ),
        F.col("text").alias("input"),
        "quality",
    )
