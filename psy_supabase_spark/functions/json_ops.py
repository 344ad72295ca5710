"""JSON metadata accessors.

The reference stores schemaless JSONB metadata and filters it with
``->>`` / casts (reference `query.txt:154`, `database.py:357-375`).  Spark
parity: ``get_json_object`` over a JSON string column — absent keys and
malformed JSON both yield NULL, which matches Postgres ``->>`` on a missing
key and the reference's parse-and-skip client loop (`database.py:326-331`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def json_get(col: ColumnOrName, path: str) -> Column:
    """`metadata->>'key'` parity: NULL on missing key or malformed JSON."""
    return F.get_json_object(_c(col), f"$.{path}")


def json_get_float(col: ColumnOrName, path: str) -> Column:
    """`CAST(metadata->'a'->>'b' AS FLOAT)` parity (reference database.py:364)."""
    return json_get(col, path).cast("double")


def json_topic_matches(col: ColumnOrName, topic: str, *, case_insensitive: bool = True) -> Column:
    """Topic equality filter; the reference has both a case-sensitive server
    path (query.txt:154) and a case-insensitive client path
    (database.py:333-336) — default to the client semantics."""
    t = json_get(col, "topic")
    return (F.lower(t) == topic.lower()) if case_insensitive else (t == topic)
