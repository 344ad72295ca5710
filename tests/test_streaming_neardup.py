"""Streaming near-dup filter: cross-batch rejection via the sketch index,
within-batch first-occurrence semantics, crash/replay idempotence, and a
real foreachBatch integration over a file stream."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.streaming.neardup import StreamingNearDupFilter

A = "the quick brown fox jumps over the lazy dog again and again today"
A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
B = "completely different content about distributed spark query engines"
C = "a third unrelated document concerning byte pair encoding tokenizers"
SCHEMA = "doc_id long, text string"


@pytest.fixture()
def filt(spark, tmp_path):
    return StreamingNearDupFilter(spark, str(tmp_path / "idx"))


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_within_batch_keeps_first_occurrence(filt, spark):
    batch = spark.createDataFrame([(1, A), (2, A_NEAR), (3, B)], SCHEMA)
    out = filt.process_batch(batch)
    assert _ids(out) == [1, 3]  # 2 near-dups 1; min id is the representative


def test_cross_batch_rejects_against_index(filt, spark):
    filt.process_batch(spark.createDataFrame([(1, A), (3, B)], SCHEMA))
    out = filt.process_batch(
        spark.createDataFrame([(4, A_NEAR), (5, C), (6, A)], SCHEMA)
    )
    assert _ids(out) == [5]  # 4 and 6 collide with indexed doc 1
    # index grew by the admitted sketch only
    assert filt.index.read().count() == 3


def test_exact_dup_within_batch_and_chain(filt, spark):
    # chain a~b, b~c via identical text: one representative for the chain
    batch = spark.createDataFrame([(10, B), (11, B), (12, B), (13, C)], SCHEMA)
    out = filt.process_batch(batch)
    assert _ids(out) == [10, 13]


def test_replay_is_idempotent_decision(filt, spark):
    """A replayed batch (same data) admits nothing new and the admitted
    set it computes is either identical (pre-commit crash) or empty
    (post-commit crash) — never a partial mix that corrupts the sink."""
    batch = spark.createDataFrame([(1, A), (2, B)], SCHEMA)
    first = _ids(filt.process_batch(batch))
    assert first == [1, 2]
    replay = _ids(filt.process_batch(batch))
    assert replay == []  # post-commit replay: index already has both
    assert filt.index.read().count() == 2  # no duplicate sketches admitted


def test_foreachbatch_integration(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sink_rows = []

    filt = StreamingNearDupFilter(
        spark,
        str(tmp_path / "idx"),
        sink=lambda df, epoch: sink_rows.extend(r.doc_id for r in df.collect()),
    )
    # two files staggered >1s: file-source batches follow mtime order
    spark.createDataFrame([(1, A), (2, B)], SCHEMA).coalesce(1).write.parquet(
        str(src / "f1")
    )
    time.sleep(1.2)
    spark.createDataFrame([(3, A_NEAR), (4, C)], SCHEMA).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(filt.process_batch)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(sink_rows) == [1, 2, 4]  # 3 rejected against batch-1 index
