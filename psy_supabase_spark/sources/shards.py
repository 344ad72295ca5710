"""Deterministic global shuffle + sharding — the trainer hand-off.

A training run wants the corpus as N shards that are (a) globally
shuffled (no source/domain runs — SGD assumes exchangeability within an
epoch), (b) near-equal sized (data-parallel workers stride shards; the
slowest shard gates the step), and (c) REPRODUCIBLE — the same corpus +
seed must yield byte-identical shards so a resumed or re-launched run
sees the same data order.

Spark's own ``repartition(n)`` round-robin gives none of that: it
depends on upstream partitioning and task scheduling.  This module
derives everything from the engine's portable hash
(:func:`functions.hashing.md5_hash32`, the :mod:`operators.sampling`
primitive):

- **shard**   = hash(seed ‖ key) mod N — uniform, so shards are
  near-equal by the law of large numbers (no sequential bin-packing:
  greedy token balancing needs a global sequential pass, the opposite
  of a 100 TB shuffle; the audit frame reports the actual spread so the
  trainer can verify the balance held).
- **order**   = within a shard, rows sort by (hash, key) — a
  deterministic pseudo-random permutation; the key tie-break makes the
  order total even under hash collisions.
- **write**   = one file per shard via ``repartition(N, shard)`` +
  ``partitionBy(shard)`` + ``sortWithinPartitions`` — shard directories
  are stable names (``shard=K``), contents byte-stable.

Changing ``seed`` re-permutes everything (epoch reshuffles); changing
the corpus only moves the changed keys (hash locality — an appended doc
lands in one shard, the other N-1 shards' row sets are untouched,
though their file bytes re-serialize on rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.hashing import md5_hash32


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    *,
    key_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    order_col: str = "_shuffle_order",
) -> DataFrame:
    """Append (shard, order) columns.  Pure map-side — pushes to the
    scan; no shuffle until the caller writes or re-groups."""
    h = md5_hash32(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    return df.withColumn(shard_col, (h % n_shards).cast("int")).withColumn(order_col, h)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    key_col: str = "doc_id",
    seed: int = 0,
    token_col: str | None = None,
    fmt: str = "json",
    compression: str | None = "gzip",
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` (one file per shard, JSONL by
    default) and RETURN the audit frame: (shard, n_rows[, n_tokens]) —
    collect it to verify the balance before pointing a trainer at the
    output.

    One shuffle total: ``repartition(n_shards, shard)`` co-locates each
    shard into one task whose rows are sorted by the permutation hash,
    so every run of the same (corpus, seed) serializes identical shard
    contents.  ``fmt`` is any DataFrameWriter format ("json" = JSONL,
    "parquet" for parquet-native loaders).
    """
    tagged = shard_assignments(df, n_shards, key_col=key_col, seed=seed)
    writer = (
        tagged.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_shuffle_order", key_col)
        .drop("_shuffle_order")
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
    )
    if fmt == "json":
        writer = writer.option("ignoreNullFields", "false")
    if compression is not None:
        writer = writer.option("compression", compression)
    writer.save(path)

    aggs = [F.count("*").alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    return tagged.groupBy("shard").agg(*aggs).orderBy("shard")


def read_training_shards(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    fmt: str = "json",
    shards: list[int] | None = None,
) -> DataFrame:
    """Read shards back (explicit schema — no inference scan).  ``shards``
    prunes to specific shard directories via the partition column, so a
    worker reading its stride touches only its own files."""
    reader = spark.read.schema(
        schema if not isinstance(schema, str) else StructType.fromDDL(schema)
    )
    df = reader.format(fmt).option("basePath", path).load(path)
    if shards is not None:
        df = df.where(F.col("shard").isin(shards))
    return df
