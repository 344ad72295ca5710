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
    """Flagship query: the reference's RAG retrieval (SURVEY.md §3.1 step 8)
    — cosine top-k over the knowledge base, joined back to document text.
    Broadcast join of the k-row result side; corpus scanned once."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.operators import topk
    from psy_supabase_spark.queries.vector_queries import TOPK, _query_vec
    from psy_supabase_spark.sources.catalog import load_table

    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    docs = load_table(spark, SMOKE_SF_DIR, "documents")
    hits = topk.topk_similarity(emb, _query_vec(spark, SMOKE_SF_DIR), k=TOPK)
    return (
        docs.join(F.broadcast(hits), docs.doc_id == hits.vec_id, "inner")
        .select("vec_id", "similarity", "text", "lang", "source")
        .orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from psy_supabase_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for genuinely
    non-SQL-expressible ops — driver records a rows-only check)."""
    from psy_supabase_spark.registry import ORACLES

    return dict(ORACLES)
