"""Canonical schemas.

The reference declares two DDL tables per tenant (`query.txt:68-85` in the
reference repo): ``interactions`` (conversation log, JSONB metadata) and
``knowledge_base`` (content + `vector(1536)` embedding).  We re-express them
as single multi-tenant tables with a ``user_id`` column (partition column at
scale — partition pruning replaces schema-per-user isolation,
`database.py:24` in the reference).

Embedding dim is parameterized (the reference's DDL says 1536 but its model
actually emits hidden-size vectors, `text_generator.py:314-316`).
"""

from __future__ import annotations

from pyspark.sql import types as T

EMBEDDING_DIM_DEFAULT = 1536

# Reference `interactions` (query.txt:68-76) + tenancy column.
INTERACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("interactionID", T.LongType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("context", T.StringType(), True),
        T.StructField("question", T.StringType(), True),
        T.StructField("answer", T.StringType(), True),
        # JSONB kept as a JSON string + get_json_object/from_json accessors —
        # matches the reference's schemaless metadata writes
        # (database.py:106-111, rag_processor.py:163-168).
        T.StructField("metadata", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# Typed view of the hot metadata keys (SURVEY.md §1.2) for fast paths.
METADATA_STRUCT = T.StructType(
    [
        T.StructField("topic", T.StringType(), True),
        T.StructField("prompt_template", T.StringType(), True),
        T.StructField("questionID", T.StringType(), True),
        T.StructField(
            "effectiveness",
            T.StructType(
                [
                    T.StructField("term_overlap", T.DoubleType(), True),
                    T.StructField("template_adherence", T.StringType(), True),
                    T.StructField("response_length", T.LongType(), True),
                    T.StructField("length_quality", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("detected_category", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
    ]
)


def knowledge_base_schema(dim: int = EMBEDDING_DIM_DEFAULT) -> T.StructType:
    """Reference `knowledge_base` (query.txt:79-85) with a native array
    embedding column — no `"[0.1,...]"` string round-trip (the reference
    serializes vectors to text, database.py:394-399; native arrays make the
    codec disappear and keep cosine math JVM-side)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("user_id", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType(), containsNull=False), True),
        ]
    )


# ---- driver testdata tables (TESTDATA.md) ----
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
