"""Structured Streaming ingest (SURVEY.md §2.11, §7 Phase 7).

The reference has no streaming engine, but its write path IS a stream:
every request appends one interaction row (reference `rag_processor.py:170`
via the `add_interaction` RPC, `query.txt:161-183`) and its reads are
recency-windowed.  Spark-native upgrade:

- ``stream_events``: file-source stream over an events directory
  (at production scale this is Kafka/Kinesis — same downstream code).
- ``append_stream``: watermarked append into the interactions store
  (exactly-once via checkpoint; replaces per-request INSERT).
- ``hourly_rollup_stream``: tumbling event-time window aggregate with
  late-data handling — the streaming twin of the batch
  ``events_hourly_rollup`` query (equivalence tested).
- ``session_window_stream``: conversation-session grouping via
  ``session_window`` — the streaming twin of ``operators.windows
  .sessionize`` (equivalence tested with an all-data watermark).

Every aggregate here keeps state bounded by the watermark: at 100 TB/day
the state store holds only open windows, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, directory: str, *, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of event rows (schema fixed — streaming sources
    never infer)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def append_stream(events: DataFrame, path: str, checkpoint: str, *, watermark: str = "10 minutes"):
    """Watermarked append sink — the reference's per-request insert (S5)
    as a continuous exactly-once ingest."""
    return (
        events.withWatermark("ts", watermark)
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def hourly_rollup_stream(events: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time rollup; late rows beyond the watermark
    are dropped, state is bounded to open windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("hour"), "event_type", "n_events", "total_value")
    )


def session_window_stream(events: DataFrame, *, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session-window aggregate per user (reference's conversation-session
    notion, SURVEY.md §2.11); gap semantics match operators.windows
    .sessionize with strict-> comparison."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(events: DataFrame, *, key_cols: list[str] | None = None, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event within
    the watermark horizon (``dropDuplicatesWithinWatermark`` keeps state
    only for the watermark window — bounded, unlike dropDuplicates which
    remembers keys forever).  The streaming twin of
    operators/dedup.exact_dedup for an at-least-once ingest feed."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with right events
    for the same key whose timestamp falls in [left_ts, left_ts + within].

    Built-in Structured Streaming handles the state: BOTH sides are
    watermarked and the join condition carries the time bound, so each
    side's state store evicts rows once the other side's watermark passes
    the bound — state is O(events in the interval window), never
    O(stream).  This is the streaming twin of the batch range join
    (operators/asof.range_join_count — same time-bucket semantics)."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return lw.join(
        rw,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rcol >= lcol)
        & (rcol <= lcol + F.expr(f"INTERVAL {within}")),
    )


def run_available_now(stream_df: DataFrame, *, out_table: str, output_mode: str = "complete") -> None:
    """Drain everything currently available into an in-memory table and
    stop — the batch-equivalence harness used by tests ('complete' for
    aggregates, 'append' for row streams)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(out_table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def rate_stream_demo(spark: SparkSession, *, rows_per_second: int = 100) -> DataFrame:
    """Infrastructure-free demo/test stream: the built-in rate source
    mapped deterministically into the events schema (value → ids/types by
    modular arithmetic).  Useful for soak tests and for exercising every
    downstream operator without files or Kafka."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", str(rows_per_second)).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "error")]),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000).cast("double").alias("value"),
        F.to_json(F.struct((F.col("value") % 7).alias("k"))).alias("props"),
    )


def upsert_batch(store_path: str, key_col: str = "event_id", ts_col: str = "ts"):
    """foreachBatch MERGE-upsert into a keyed parquet store: per
    micro-batch, latest-row-per-key wins (batch beats store on ties —
    redelivery refreshes).  Parquet has no row-level MERGE, so the upsert
    rewrites the store via union + row_number; on Delta/Iceberg the same
    function body becomes a real MERGE INTO and only touched files
    rewrite.  Idempotent under micro-batch replay: re-applying a batch
    yields the same store (asserted in tests)."""
    from pyspark.sql import Window

    import glob
    import os
    import shutil

    from pyspark.errors import AnalysisException

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        old = store_path.rstrip("/") + f".old-{batch_id}"
        # crash recovery: a crash between the two os.replace calls below
        # leaves the store absent and the whole accumulated history parked
        # at .old-{N}; restore it before reading, else this batch would
        # "first-batch" rebuild from only the current micro-batch and
        # orphan everything accumulated.  Recover from the .old-* sibling
        # with the NEWEST CONTENT (mtime), not just .old-{batch_id} and
        # not the highest id: a restart with a fresh checkpoint dir resets
        # batch ids to 0, so a stale .old-42 dropping from an earlier
        # crash can carry a HIGHER id than the truly-newest .old-0 —
        # os.replace preserves the directory's mtime, which is when its
        # contents were last written, i.e. exactly "how recent is this
        # parked history".
        # Only dirs the upsert machinery itself parks are candidates: a
        # numeric batch-id suffix AND parquet content (part files or a
        # _SUCCESS marker).  The content check also rejects a sibling
        # gutted by a previously-failed sweep (whose dir mtime the
        # partial deletion freshened — promoting it would replace real
        # history with a husk).  Ties on coarse-granularity mtimes break
        # on the numeric id, not lexicographic path order.
        if not os.path.exists(store_path):
            candidates = []
            for p in glob.glob(store_path.rstrip("/") + ".old-*"):
                suffix = p.rsplit(".old-", 1)[1]
                if not suffix.isdigit():
                    continue  # never touch dirs this machinery didn't park
                if not (
                    glob.glob(os.path.join(p, "part-*"))
                    or os.path.exists(os.path.join(p, "_SUCCESS"))
                ):
                    continue
                try:
                    candidates.append((os.path.getmtime(p), int(suffix), p))
                except FileNotFoundError:
                    continue
            if candidates:
                candidates.sort()
                os.replace(candidates[-1][2], store_path)
                for _, _, stale in candidates[:-1]:
                    shutil.rmtree(stale, ignore_errors=True)
        new = batch_df.withColumn("_src", F.lit(1))
        try:
            cur = spark.read.parquet(store_path).withColumn("_src", F.lit(0))
            merged = cur.unionByName(new)
        except AnalysisException as e:
            # ONLY path-absent means "first batch".  Any other read failure
            # (corrupt footer, permissions, transient FS) must propagate —
            # swallowing it would overwrite the whole accumulated store
            # with just this micro-batch.
            klass = (e.getCondition() if hasattr(e, "getCondition") else None) or ""
            if "PATH_NOT_FOUND" not in klass and "Path does not exist" not in str(e):
                raise
            merged = new
        # final tie-break: a full-row hash.  Without it, two same-key
        # same-ts rows in ONE batch (redelivery-with-correction) rank
        # nondeterministically, so a crash-replay of the batch could
        # keep the OTHER row — exactly the non-idempotence this sink's
        # contract rules out (r14 review).  The hash is arbitrary but
        # REPLAY-STABLE: same rows, same winner, whatever the partition
        # or task order.
        row_hash = F.xxhash64(F.struct(*[F.col(c) for c in batch_df.columns]))
        w = Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col("_src").desc(), row_hash.desc()
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_src")
        )
        # stage-then-swap: never overwrite the path the plan is reading
        # (mode('overwrite') deletes the input files first; a cache-and-
        # overwrite "works" only until an evicted block recomputes from the
        # deleted files).  Local-FS spelling; on a lakehouse table this
        # whole body is one MERGE INTO / TxTable.overwrite.
        staging = store_path.rstrip("/") + f".staging-{batch_id}"
        latest.write.mode("overwrite").parquet(staging)
        if os.path.exists(store_path):
            # a prior attempt that crashed after its final replace may have
            # left a non-empty .old-{batch_id}; clear it or os.replace
            # below raises ENOTEMPTY and permanently fails the stream
            shutil.rmtree(old, ignore_errors=True)
            os.replace(store_path, old)
        os.replace(staging, store_path)
        shutil.rmtree(old, ignore_errors=True)

    return apply


def upsert_stream(events: DataFrame, store_path: str, checkpoint: str):
    """Continuous keyed upsert via foreachBatch (the S5 insert upgraded to
    last-write-wins semantics)."""
    return (
        events.writeStream.foreachBatch(upsert_batch(store_path))
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
