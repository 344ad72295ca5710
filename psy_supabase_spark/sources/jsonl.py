"""JSONL (JSON-lines) interchange — the trainer-facing sink/source.

Training stacks consume shuffled JSONL shards (one JSON object per line,
optionally gzipped); this module is the boundary where the engine's
parquet-native world exports to that format and re-ingests it.

Scale rules encoded here:

- **Reads take an explicit schema.**  ``spark.read.json`` without one
  runs a full inference scan first — at 100 TB that is a second read of
  the corpus before the first real job.  Callers pass the DDL/StructType
  they expect; malformed lines land in ``_corrupt_record`` (PERMISSIVE)
  instead of failing the shard.
- **Writes bound shard size with ``maxRecordsPerFile``** so downstream
  data loaders get uniform shards regardless of upstream partitioning,
  and keep null fields (``ignoreNullFields=false``) so every record
  carries the full schema — trainers index by key, not by presence.
- **Compression is gzip by default** (the de-facto JSONL interchange
  codec; splittable formats don't matter for write-once shards that
  loaders stream end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    compression: str | None = "gzip",
    max_records_per_file: int | None = 100_000,
    num_shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as JSONL shards under ``path``.

    ``num_shards`` repartitions (round-robin — even shards from skewed
    upstreams) before writing; ``max_records_per_file`` caps records per
    file within each task regardless.
    """
    if num_shards is not None:
        df = df.repartition(num_shards)
    writer = df.write.mode(mode).option("ignoreNullFields", "false")
    if compression is not None:
        writer = writer.option("compression", compression)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSONL with an EXPLICIT schema (no inference scan).

    PERMISSIVE mode: malformed lines become all-null rows with the raw
    line in ``_corrupt_record`` when ``keep_corrupt`` (the audit spelling
    — count them, then decide), else they are dropped (DROPMALFORMED).

    Spark constraint: a query that references ONLY ``_corrupt_record``
    (e.g. ``df.where(col("_corrupt_record").isNotNull()).count()``) is
    disallowed on a raw JSON scan — ``.cache()`` the returned frame first
    or include a data column in the projection.
    """
    if keep_corrupt:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        # StructType.add mutates in place — copy so the CALLER's schema
        # object doesn't silently grow a _corrupt_record field
        schema = StructType(list(schema.fields)).add("_corrupt_record", "string")
        return (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
