"""applyInPandasWithState rolling context == the batch window answer when
the whole stream fits one micro-batch (the semantics check; multi-batch
state carry-over is exercised with maxFilesPerTrigger=1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import windows
from psy_supabase_spark.sources.catalog import load_table
from psy_supabase_spark.streaming import ingest
from psy_supabase_spark.streaming.stateful import rolling_context_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """3 time-range files landed in ts order with distinct mtimes: the file
    source orders micro-batches by modification time, so same-second
    writes would arrive in arbitrary order."""
    import time

    path = str(tmp_path_factory.mktemp("events_state"))
    ev = load_table(spark, SF, "events").cache()
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).head()
    span = (hi - lo) / 3
    bounds = [lo + span, lo + 2 * span]
    slices = [
        ev.where(F.col("ts") < bounds[0]),
        ev.where((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
        ev.where(F.col("ts") >= bounds[1]),
    ]
    for part in slices:
        part.coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.2)
    return path


def _batch_expected(spark):
    ev = load_table(spark, SF, "events")
    out = windows.rolling_context(
        ev, partition_by="user_id", order_by=["ts", "event_id"], render=F.col("event_type"), n_turns=3
    )
    return {r.event_id: r.context for r in out.select("event_id", "context").collect()}


def test_stateful_context_single_batch_matches_window(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir)
    ingest.run_available_now(rolling_context_stream(stream), out_table="ctx_single", output_mode="append")
    got = {r.event_id: r.context for r in spark.table("ctx_single").collect()}
    assert got == _batch_expected(spark)


def test_stateful_context_carries_state_across_microbatches(spark, events_dir):
    stream = ingest.stream_events(spark, events_dir, max_files_per_trigger=1)
    ingest.run_available_now(rolling_context_stream(stream), out_table="ctx_multi", output_mode="append")
    got = {r.event_id: r.context for r in spark.table("ctx_multi").collect()}
    want = _batch_expected(spark)
    assert len(got) == len(want)
    # per-file event-time split + ordered landing → identical contexts,
    # including rows whose history spans a micro-batch boundary
    assert got == want
