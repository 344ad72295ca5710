"""Scale-engineering operators: bucketed co-located joins and skew salting.

These are the two levers the 100 TB plan needs beyond stock AQE:

- **Bucketing** removes the shuffle from repeated big-big joins.  The
  lineitem⨝orders join shuffles both sides on every run; bucketing both
  tables by the join key at write time makes every subsequent join
  shuffle-free (SortMergeJoin with zero Exchange) — the Spark spelling of
  co-located storage.  Verified by plan assertion in tests.
- **Salting** spreads one hot key over N synthetic sub-keys.  AQE's skew
  join handles skewed *partitions* at runtime; explicit salting is still
  the right tool when a single key exceeds one executor's memory in an
  aggregation, or when the skew is known ahead of time.  The two-phase
  salted aggregation below is algebraically exact for decomposable
  aggregates (sum/count/min/max).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def spread_for_compute(df: DataFrame, *, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition an UNDER-partitioned input ahead of an
    expensive per-row stage; no-op when the input already has at least
    cluster parallelism (r14 opt, guide §2.5 "input skew: repartition
    immediately after the read").

    Why: a small/compacted parquet table arrives as 1-few scan splits (a
    2 MB file is one row group — scan-split knobs cannot divide it), so
    every map-side stage BELOW the first exchange (regex pipelines, gram
    explodes, Arrow/pandas stages, partial aggregates) runs on 1-few
    cores no matter how wide the cluster is — measured at sf0.1: the
    WARC evidence leg wall ≈ its single-core cpu (2.0 s), text_profile
    at parallelism ~2 of 32.  One tiny round-robin exchange (table-sized,
    here MBs) unlocks the full width.

    Scale posture: at 100 TB the scan has thousands of splits, the
    partition probe sees ≥ parallelism, and this is a literal no-op — so
    the helper never adds a corpus-wide shuffle where the input is
    already wide.  Determinism under retries is Spark's own
    sort-before-repartition (SPARK-23207, on by default).  Streaming
    frames pass through untouched (no partition probe on an unbounded
    plan).

    NOT a blanket fix — apply only where a measured-heavy map stage sits
    below the first exchange.  Each spread task carries a fixed cost
    (~0.15 cpu-s of codegen/task setup, ~0.3 cpu-s more if the stage
    crosses the Python boundary — measured with an identity mapInPandas
    at 32 partitions: ~9 cpu-s/run of pure protocol floor), so light
    stages REGRESS under it (measured at sf0.1: blob features 0.57 →
    0.95 s, WAT leg 0.36 → 0.60 s, media sniff 0.73 → 1.60 s), and
    spread-at-load regressed join/agg-shaped queries outright
    (revenue_by_nation 1.89×, events_hourly_rollup 2.13×,
    training_pipeline 1.44×).  The wins it IS wired into:
    text_profile 3.44 → 2.55 s, response_clean 1.76 → 1.39 s, the
    multimodal WARC evidence leg 2.49 → 1.19 s."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    *,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.
    Buckets are the unit of co-location: joins/aggs on bucket_col against
    another table with the SAME bucketing need no Exchange."""
    import shutil

    spark = df.sparkSession
    # idempotent re-create: a dangling managed-table location (metadata died
    # with a previous session, files survived) blocks saveAsTable
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed tables — plans as SortMergeJoin with no
    shuffle on either side (asserted in tests/test_scale.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def _content_salt(df: DataFrame, n_salts: int) -> Column:
    """Retry-stable per-row salt: xxhash64 over EVERY column of the row
    PLUS the map partition id.

    Salts derived from ``monotonically_increasing_id`` are retry-unstable
    — a recomputed map task can iterate its rows in a different order
    after an executor loss, re-routing rows to different reducers than
    the first attempt and double-counting/dropping them in a downstream
    shuffle.  Row content + ``spark_partition_id()`` is stable across
    retries (a partition's CONTENT is deterministic even though its
    iteration order is not), and the partition-id term spreads a hot key
    made of IDENTICAL rows across as many salts as the partitions it
    arrives in — pure content hashing would collapse all duplicates onto
    one reducer and defeat the salt.  Within one map partition identical
    rows still share a salt, so the residual per-salt concentration is
    bounded by one input partition's share of the key."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.spark_partition_id()),
        F.lit(n_salts),
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    agg_exprs: list[Column],
    final_exprs: list[Column],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salt: groupBy(key, salt) → partial, then
    groupBy(key) → final.  Exact for decomposable aggregates; a hot key
    spreads over up to n_salts partial groups (distinct rows spread by
    content; identical rows by the map partitions they arrive in — see
    :func:`_content_salt` — so one reducer's share is bounded by
    max(1/n_salts, one input partition's share of the key)).

    agg_exprs: partial aggregates (e.g. [sum(x).alias('s'), count('*')
    .alias('c')]); final_exprs: how to merge partials (e.g.
    [sum('s').alias('total'), sum('c').alias('n')]).
    """
    salted = df.withColumn("_salt", _content_salt(df, n_salts))
    partial = salted.groupBy(key_col, "_salt").agg(*agg_exprs)
    return partial.groupBy(key_col).agg(*final_exprs)


def salted_join_hot_keys(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: list,
    *,
    n_salts: int = 8,
) -> DataFrame:
    """Skew join: replicate the dim rows of known-hot keys n_salts times,
    salt the fact side, join on (key, salt).  Non-hot keys use salt 0 on
    both sides, so the result is row-identical to the plain join
    (asserted in tests)."""
    is_hot = F.col(on).isin(hot_keys)
    facts_salted = facts.withColumn(
        "_salt",
        F.when(is_hot, _content_salt(facts, n_salts)).otherwise(F.lit(0)),
    )
    explode_salts = F.when(is_hot, F.array(*[F.lit(i) for i in range(n_salts)])).otherwise(
        F.array(F.lit(0))
    )
    dim_replicated = dim.withColumn("_salt", F.explode(explode_salts))
    out = facts_salted.join(dim_replicated, [on, "_salt"]).drop("_salt")
    return out


def salted_join_hot_df(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    hot_df: DataFrame,
    *,
    n_salts: int = 8,
) -> DataFrame:
    """:func:`salted_join_hot_keys` with the hot-key set as a (small)
    DataFrame broadcast into the plan instead of a driver-collected
    literal list.

    This keeps skew protection fully declarative: no ``collect()``, no
    ``localCheckpoint`` to share the frame between a hot-scan job and the
    main job — ONE action computes the hot set, salts, and joins, and any
    exchange shared between the hot-set subtree and the main subtree is
    deduplicated by ReusedExchange inside the single DAG.  Output is
    row-identical to the plain join (salt 0 on both sides for non-hot
    keys; each hot fact row meets exactly one dim replica)."""
    hot = F.broadcast(
        hot_df.select(F.col(on)).distinct().withColumn("_hot", F.lit(True))
    )
    facts_salted = (
        facts.join(hot, on, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), _content_salt(facts, n_salts)).otherwise(
                F.lit(0)
            ),
        )
        .drop("_hot")
    )
    explode_salts = F.when(
        F.col("_hot").isNotNull(), F.array(*[F.lit(i) for i in range(n_salts)])
    ).otherwise(F.array(F.lit(0)))
    dim_replicated = (
        dim.join(hot, on, "left")
        .withColumn("_salt", F.explode(explode_salts))
        .drop("_hot")
    )
    return facts_salted.join(dim_replicated, [on, "_salt"]).drop("_salt")


def zorder_value(col_a: Column | str, col_b: Column | str, *, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative ints — pure codegen
    bit ops (the loop builds the expression in Python; Python-int shift
    amounts, per the F.shiftright quirk).  Columns wider than `bits` bits
    must be range-bucketed first (`ntile`/scaling) — standard Z-order
    practice, since only relative order matters for skipping."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("bigint")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order data clustering: range-partition + sort by the Morton value
    of TWO predicate columns, so every written file covers a small
    bounding box in (col_a, col_b) space and parquet min/max footer stats
    prune files/row-groups for predicates on EITHER column — a linear sort
    gives tight bounds on one column only.  This is Delta OPTIMIZE ZORDER
    BY, spelled as repartitionByRange + sortWithinPartitions."""
    z = zorder_value(col_a, col_b, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction for a FLAT (unpartitioned) append-heavy
    parquet store (streaming ingest writes one file per micro-batch;
    thousands of KB-files destroy scan throughput at 100 TB — the classic
    fix is a periodic rewrite to ~target-size files).  Returns the file
    count after compaction.  On Delta/Iceberg this is OPTIMIZE /
    rewrite_data_files; the parquet spelling is read → repartition →
    overwrite-and-swap.

    Scope (r15, r14 verdict #3): this helper rewrites the store FLAT and
    repartitions the WHOLE store (a full shuffle) — correct only for
    unpartitioned micro-batch sinks.  For a `user_id=`-partitioned
    tenant store use :meth:`sources.tenancy.TenantStore.compact`, which
    rewrites per partition, preserves the pruning layout, and shuffles
    one partition at a time.  The swap here goes through the path's own
    Hadoop filesystem (the TenantStore.compact spelling — works on
    s3a://, hdfs://, not just the driver's local disk) but is still NOT
    transactional: parquet has no commit protocol, so run it under a
    one-writer contract; a concurrent reader can catch the
    delete-rename window (Delta/Iceberg make this step ACID)."""
    import math

    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = path.rstrip("/") + "._compact"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # swap through the path's own filesystem (cluster-correct); NOT atomic
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath(path), True)
    fs.rename(hpath(tmp), hpath(path))
    return sum(
        1
        for st in fs.listStatus(hpath(path))
        if st.getPath().getName().endswith(".parquet")
    )
