"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``psy_supabase_spark``; this module only adapts it
to the driver contract.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's /chat lifecycle (SURVEY.md §3.1) as
    ONE lazy DataFrame DAG — safety gate (step 4), template selection
    (step 5), cosine top-k retrieval (step 8), prompt build (step 9 input),
    toxicity gate (step 10), and the T6 response-cleaning pass the
    reference applies to every generated response
    (text_generator.py:149-253) — over the sf0.001 tables.  The reference
    runs these as sequential Python calls with an RPC per step; here
    Catalyst fuses the scalar stages into the scan and the only exchanges
    are the top-k merge and the broadcast of the k retrieved rows."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.functions import response_clean as RC
    from psy_supabase_spark.functions import text as TX
    from psy_supabase_spark.operators import ml_udfs, topk
    from psy_supabase_spark.queries.vector_queries import TOPK, _query_vec
    from psy_supabase_spark.sources.catalog import load_table

    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    hits = topk.topk_similarity(emb, _query_vec(spark, SMOKE_SF_DIR), k=TOPK)
    retrieved = docs.join(F.broadcast(hits), docs.doc_id == hits.vec_id, "inner")
    staged = retrieved.select(
        "vec_id",
        "similarity",
        "text",
        "lang",
        "source",
        TX.safety_category("text").alias("safety_category"),
        TX.select_template("text").alias("template"),
        ml_udfs.is_toxic("text").alias("toxic"),
    ).withColumn(
        "prompt",
        F.when(F.col("safety_category").isNotNull(), F.lit(None).cast("string")).otherwise(
            ml_udfs.generate_stub(F.col("text"), F.col("template"))
        ),
    )
    cleaned = RC.apply_clean_response(
        staged.withColumn("_raw_response", F.coalesce(F.col("prompt"), F.lit(""))),
        "_raw_response",
        "response",
    ).drop("_raw_response")
    return cleaned.orderBy(F.col("similarity").desc(), F.col("vec_id").asc())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from psy_supabase_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops — driver records a rows-only check)."""
    from psy_supabase_spark.registry import ORACLES

    return dict(ORACLES)
