"""Structured Streaming ↔ batch equivalence: the streaming rollup and
session windows must produce the batch answers when the stream drains
fully (availableNow) — plus the watermarked append ingest round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import windows
from psy_supabase_spark.sources.catalog import load_table
from psy_supabase_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-land events as a plain-µs parquet directory (stream sources read
    directories; the raw testdata file is ns-typed)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_stream_hourly_rollup_matches_batch(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir)
    ingest.run_available_now(ingest.hourly_rollup_stream(stream), out_table="hourly_s")
    got = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("hourly_s").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    want = {(r.hour, r.event_type): (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want


def test_stream_session_window_matches_batch_sessionize(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir)
    ingest.run_available_now(
        ingest.session_window_stream(stream, gap="30 minutes"), out_table="sessions_s"
    )
    got = {
        (r.user_id, r.session_start): (r.n_events, r.total_value)
        for r in spark.table("sessions_s").collect()
    }
    batch = (
        windows.sessionize(load_table(spark, SF, "events"), gap_seconds=1800)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.min("ts").alias("session_start"),
        )
    )
    want = {(r.user_id, r.session_start): (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want


def test_append_stream_roundtrip(spark, events_dir, tmp_path):
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt")
    stream = ingest.stream_events(spark, events_dir, max_files_per_trigger=2)
    q = ingest.append_stream(stream, out, ckpt).trigger(availableNow=True).start()
    q.awaitTermination()
    landed = spark.read.parquet(out)
    src = load_table(spark, SF, "events")
    assert landed.count() == src.count()
    # exactly-once: re-running the drained stream adds nothing
    q2 = ingest.append_stream(ingest.stream_events(spark, events_dir), out, ckpt).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == src.count()


def test_dedup_stream_drops_redeliveries(spark, events_dir, tmp_path):
    # land the same files twice → an at-least-once feed with full replays
    dup_dir = str(tmp_path / "dup")
    src = load_table(spark, SF, "events")
    src.write.mode("overwrite").parquet(dup_dir)
    src.write.mode("append").parquet(dup_dir)
    assert spark.read.parquet(dup_dir).count() == 2 * src.count()
    stream = ingest.stream_events(spark, dup_dir)
    ingest.run_available_now(
        ingest.dedup_stream(stream), out_table="dedup_s", output_mode="append"
    )
    deduped = spark.table("dedup_s")
    assert deduped.count() == src.count()
    assert deduped.select("event_id").distinct().count() == src.count()


def test_interval_join_matches_batch(spark, events_dir, tmp_path):
    """Stream-stream interval join drains to exactly the batch interval
    join's answer, and the plan carries state-eviction watermarks on both
    sides."""
    ev = load_table(spark, SF, "events")
    signup = ev.where(F.col("event_type") == "signup").select("user_id", "ts")
    click = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ts2"), "value"
    )
    batch = signup.alias("l").join(
        click.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts2") >= F.col("l.ts"))
        & (F.col("r.ts2") <= F.col("l.ts") + F.expr("INTERVAL 15 minutes")),
    )
    want = batch.count()
    assert want > 0

    src = ingest.stream_events(spark, events_dir)
    joined = ingest.interval_join_streams(
        src.where(F.col("event_type") == "signup").select("user_id", "ts"),
        src.where(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("ts2"), "value"
        ),
        right_ts="ts2",
    )
    q = (
        joined.writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("ivjoin")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("ivjoin").count() == want


def test_stream_through_ml_udfs_and_upsert(spark, tmp_path):
    """Integration: file stream → pandas-UDF embedding + toxicity gate →
    keyed upsert store.  Proves the Arrow-batched UDFs (M1/M3) and the
    foreachBatch sink compose inside Structured Streaming micro-batches."""
    from psy_supabase_spark.operators import ml_udfs

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(
        [(1, "a calm helpful answer", "2024-01-01 10:00:00"),
         (2, "another gentle reply", "2024-01-01 10:01:00")],
        "event_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    docs.write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, text string, ts timestamp").parquet(src)
        .withColumn("embedding", ml_udfs.hash_embedding_udf(8)(F.col("text")))
        .withColumn("toxic", ml_udfs.is_toxic("text"))
    )
    q = ingest.upsert_stream(stream, store, ckpt).trigger(availableNow=True).start()
    q.awaitTermination()

    rows = {r.event_id: r for r in spark.read.parquet(store).collect()}
    assert set(rows) == {1, 2}
    assert len(rows[1].embedding) == 8 and rows[1].toxic is False
    # determinism: the batch UDF matches the batch-mode computation
    batch = docs.withColumn("embedding", ml_udfs.hash_embedding_udf(8)(F.col("text"))).collect()
    want = {r.event_id: r.embedding for r in batch}
    assert rows[1].embedding == want[1] and rows[2].embedding == want[2]


def test_stream_through_quality_gates_matches_batch(spark, tmp_path):
    # the Gopher/C4 gates are map-side codegen structs, so they compose
    # into a stream with no state: a drained stream filtered by
    # quality_filter must keep exactly the docs the batch filter keeps
    from psy_supabase_spark.functions import quality

    docs_dir = str(tmp_path / "docs")
    docs = load_table(spark, SF, "documents")
    docs.repartition(2).write.mode("overwrite").parquet(docs_dir)
    kw = dict(min_words=25, min_stopword_hits=1, c4=False)
    want = {r.doc_id for r in quality.quality_filter(docs, **kw).collect()}

    stream = spark.readStream.schema(docs.schema).parquet(docs_dir)
    gated = quality.quality_filter(stream, **kw)
    q = (
        gated.writeStream.format("memory")
        .queryName("quality_s")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.table("quality_s").collect()}
    assert got == want and len(want) > 0


def test_stream_hll_registers_match_batch(spark, events_dir):
    """Streaming HLL (r13): the register aggregation is streaming-legal
    with sketch-bounded state — the drained stream's registers (and
    therefore the estimate) are IDENTICAL to the batch sketch, global
    and grouped."""
    from psy_supabase_spark.operators import hll
    from psy_supabase_spark.streaming import cardinality

    key = F.col("user_id").cast("string")
    stream = ingest.stream_events(spark, events_dir)
    ingest.run_available_now(
        cardinality.register_stream(stream, key, b=10), out_table="hll_regs_s"
    )
    got = {(r.bucket, r.rho) for r in spark.table("hll_regs_s").collect()}
    batch = load_table(spark, SF, "events")
    want_rows = hll.hll_registers(batch, key, b=10).collect()
    assert got == {(r.bucket, r.rho) for r in want_rows}
    assert hll.hll_estimate(list(got), b=10) == hll.hll_estimate(
        want_rows, b=10
    )
    # grouped: one live register set per event_type
    ingest.run_available_now(
        cardinality.register_stream(stream, key, b=10, by=("event_type",)),
        out_table="hll_regs_g",
    )
    got_g = {
        (r.event_type, r.bucket, r.rho)
        for r in spark.table("hll_regs_g").collect()
    }
    want_g = {
        (r.event_type, r.bucket, r.rho)
        for r in hll.hll_registers(batch, key, b=10, by=("event_type",)).collect()
    }
    assert got_g == want_g


def test_stream_hll_fold_durable_registers(spark, events_dir, tmp_path):
    """fold_registers_stream maintains a durable register TxTable across
    micro-batches (update-mode deltas, union+max fold): after the
    stream drains — in MULTIPLE batches — the table equals the batch
    sketch exactly, and the in-engine estimate over it matches the
    driver-side estimate of the batch registers."""
    from psy_supabase_spark.operators import hll
    from psy_supabase_spark.sources.txlog import TxTable
    from psy_supabase_spark.streaming import cardinality

    key = F.col("user_id").cast("string")
    root = str(tmp_path / "hll_table")
    ckpt = str(tmp_path / "ckpt")
    stream = ingest.stream_events(spark, events_dir, max_files_per_trigger=1)
    q = (
        cardinality.fold_registers_stream(
            stream, key, table_root=root, checkpoint=ckpt, b=10
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tx = TxTable(spark, root)
    assert tx.latest_version() >= 1  # multiple batches folded
    got = tx.read().collect()
    batch = load_table(spark, SF, "events")
    want = hll.hll_registers(batch, key, b=10).collect()
    assert {(r.bucket, r.rho) for r in got} == {
        (r.bucket, r.rho) for r in want
    }
    dist = hll.hll_estimates(tx.read(), b=10).collect()[0].approx_distinct
    drv = hll.hll_estimate(want, b=10)
    assert abs(dist - drv) <= 1e-12 * drv


def test_stream_hll_fold_vacuums_superseded_snapshots(spark, events_dir, tmp_path):
    """The durable fold reclaims superseded snapshot files every
    vacuum_every-th version (r14 review: each fold overwrites a fresh
    sketch-sized snapshot and nothing ever deleted the predecessor's
    files — unbounded on-disk growth on forever-running streams).
    With vacuum_every=1 and zero retention (single writer), only the
    LIVE snapshot's data dir survives the drain; the registers are
    untouched by the cleanup."""
    import glob as _glob

    from psy_supabase_spark.operators import hll
    from psy_supabase_spark.sources.txlog import TxTable
    from psy_supabase_spark.streaming import cardinality

    key = F.col("user_id").cast("string")
    root = str(tmp_path / "hll_table_vac")
    q = (
        cardinality.fold_registers_stream(
            spark.readStream.format("parquet")
            .schema(load_table(spark, SF, "events").schema)
            .option("maxFilesPerTrigger", 1)
            .load(events_dir),
            key,
            table_root=root,
            checkpoint=str(tmp_path / "ckpt_vac"),
            b=10,
            vacuum_every=1,
            vacuum_retention_seconds=0.0,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tx = TxTable(spark, root)
    n_versions = tx.latest_version() + 1
    assert n_versions >= 2  # multiple folds happened
    data_dirs = [
        d for d in _glob.glob(root + "/data/*") if not d.endswith("_SUCCESS")
    ]
    assert len(data_dirs) == 1, data_dirs  # only the live snapshot remains
    want = hll.hll_registers(load_table(spark, SF, "events"), key, b=10).collect()
    assert {(r.bucket, r.rho) for r in tx.read().collect()} == {
        (r.bucket, r.rho) for r in want
    }
