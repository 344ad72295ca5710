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


def test_bucket_counts_track_index_incrementally(filt, spark):
    # the valve's side table must equal a full recompute over the index
    # after every batch, and carry the index head's version stamp — the
    # O(batch) incremental fold replaces the per-batch O(index) scan.
    from psy_supabase_spark.operators import dedup

    filt.process_batch(spark.createDataFrame([(1, A), (2, B)], SCHEMA))
    filt.process_batch(spark.createDataFrame([(3, C)], SCHEMA))
    filt.process_batch(spark.createDataFrame([(4, A_NEAR)], SCHEMA))  # rejected
    counts = filt.counts.read()
    assert counts.agg(F.max("idx_version")).head()[0] == filt.index.latest_version()
    full = (
        dedup.simhash_banded(
            filt.index.read().select(F.col("doc_id").alias("id"), "simhash"),
            filt.max_hamming,
        )
        .groupBy("band", "key")
        .agg(F.count("*").alias("cnt"))
    )
    got = {(r.band, r.key): r.cnt for r in counts.collect()}
    want = {(r.band, r.key): r.cnt for r in full.collect()}
    assert got == want


def test_stale_counts_stamp_falls_back_and_self_repairs(filt, spark):
    # crash window: index.append committed but the counts overwrite did
    # not — the stamp is stale.  The next admit must still be CORRECT
    # (full-recompute fallback), and the next process_batch must rebuild
    # the counts table rather than fold into the stale numbers.
    from psy_supabase_spark.operators import dedup

    filt.process_batch(spark.createDataFrame([(1, A), (2, B)], SCHEMA))
    # simulate the crash: an index append the counts never saw
    sk = dedup.simhash(spark.createDataFrame([(3, C)], SCHEMA)).select(
        F.col("id").alias("doc_id"), "simhash"
    )
    filt.index.append(sk)
    assert (
        filt.counts.read().agg(F.max("idx_version")).head()[0]
        != filt.index.latest_version()
    )
    # correctness through the stale window: near-dups of BOTH the counted
    # doc (A) and the uncounted doc (C) are rejected
    out = filt.process_batch(
        spark.createDataFrame([(4, A_NEAR), (5, C), (6, "fresh unrelated text about gradient descent optimizers")], SCHEMA)
    )
    assert _ids(out) == [6]
    # self-repair: stamp is back in sync and counts match a full recompute
    counts = filt.counts.read()
    assert counts.agg(F.max("idx_version")).head()[0] == filt.index.latest_version()
    full = (
        dedup.simhash_banded(
            filt.index.read().select(F.col("doc_id").alias("id"), "simhash"),
            filt.max_hamming,
        )
        .groupBy("band", "key")
        .agg(F.count("*").alias("cnt"))
    )
    assert {(r.band, r.key): r.cnt for r in counts.collect()} == {
        (r.band, r.key): r.cnt for r in full.collect()
    }


def test_empty_first_batch_then_restart_survives_none_stamp(spark, tmp_path):
    # ADVICE r7: a committed-but-EMPTY counts table (first processed
    # micro-batch was empty) makes agg max('idx_version') return None; a
    # restart then loses the memo, and the stamp-lag arithmetic must not
    # TypeError on None — both counts_oversized and _PendingFold's defer
    # check treat a None stamp as out-of-sync (rebuild / fold now).
    path = str(tmp_path / "idx")
    filt1 = StreamingNearDupFilter(spark, path)
    filt1.process_batch(spark.createDataFrame([], SCHEMA))
    assert filt1.counts.latest_version() >= 0  # committed, zero rows
    assert filt1.counts.read().agg(F.max("idx_version")).head()[0] is None

    # restart: fresh process, driver memo gone; fold_every=2 exercises the
    # deferred-fold stamp check as well as the valve-read path
    filt2 = StreamingNearDupFilter(spark, path, fold_every=2)
    out = filt2.process_batch(spark.createDataFrame([(1, A), (2, B)], SCHEMA))
    assert _ids(out) == [1, 2]
    out2 = filt2.process_batch(spark.createDataFrame([(3, A_NEAR)], SCHEMA))
    assert _ids(out2) == []


def test_oversized_bucket_changing_between_batches_stays_aligned(spark, tmp_path):
    # VERDICT r4 #7: when the index's oversized (band, key) set CHANGES
    # between micro-batches, the two-sided subdivision must stay aligned —
    # a doc near-duplicating an indexed sketch that sits in a bucket which
    # only BECAME oversized later must still be rejected (completeness),
    # and unrelated docs still admitted.
    from psy_supabase_spark.operators import dedup
    from psy_supabase_spark.sources.txlog import TxTable

    idx_path = str(tmp_path / "idx")
    filt = StreamingNearDupFilter(spark, idx_path, bucket_cap=2)
    # the incoming doc A's sketch, computed exactly as admit() will
    sh_a = int(dedup.simhash(spark.createDataFrame([(0, A)], SCHEMA)).head()[1])
    # indexed near-dup n: hamming(A, n) = 3 with one flipped bit in each
    # of bands 1..3 — so the ONLY band where A and n collide is band 0.
    # Rejection of A therefore has to travel through band 0's bucket.
    near = sh_a ^ (1 << 8) ^ (1 << 16) ^ (1 << 24)
    n_df = spark.createDataFrame([(100, near)], "doc_id long, simhash long")
    filt.index.append(n_df)
    filt._update_counts(n_df)
    # batch 1 is small: band-0 bucket (low byte of sh_a) is NOT oversized.
    # batch 2 grows the index: four far sketches (hamming >= 5 from A,
    # bits flipped only inside bands 1-2) share A's band-0 key → the
    # band-0 bucket flips to OVERSIZED (5 members > cap=2) between batches
    far = [
        sh_a ^ (pat << 8)
        for pat in (0b11111, 0b1111100000, 0b111110000000000, 0b10101010101)
    ]
    far_df = spark.createDataFrame(
        [(200 + i, s) for i, s in enumerate(far)], "doc_id long, simhash long"
    )
    filt.index.append(far_df)
    filt._update_counts(far_df)
    over = filt._index_oversized(None)  # counts in sync → no index scan needed
    assert (0, sh_a & 0xFF) in {(r.band, r.key) for r in over.collect()}
    # batch 3 through the real path: A must be rejected via n, reachable
    # ONLY through the now-oversized (and therefore subdivided-on-both-
    # sides) band-0 bucket; unrelated B must be admitted
    out = filt.process_batch(spark.createDataFrame([(1, A), (2, B)], SCHEMA))
    assert _ids(out) == [2]
