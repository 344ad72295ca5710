"""Streaming EMBEDDING near-dup admission (SRP twin of the SimHash
filter): cross-batch rejection against the accumulating index,
within-batch first-occurrence dedup, crash-replay idempotence, and the
incremental counts valve."""

from __future__ import annotations

import numpy as np

from psy_supabase_spark.streaming.neardup import StreamingEmbeddingNearDupFilter

DIM = 16


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<double>",
    )


def _base(seed, n=4):
    rng = np.random.default_rng(seed)
    out = rng.standard_normal((n, DIM))
    return out / np.linalg.norm(out, axis=1)[:, None]


def test_cross_batch_and_within_batch_dedup(spark, tmp_path):
    b = _base(1)
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idx"), dim=DIM, threshold=0.95
    )
    # batch 1: two distinct vectors + a near-copy of the first
    batch1 = _vecs(
        spark,
        [(0, b[0]), (1, b[1]), (2, b[0] + 0.01 * _base(2)[0])],
    )
    out1 = {r.vec_id for r in filt.process_batch(batch1).collect()}
    assert out1 == {0, 1}  # within-batch: min-id representative wins

    # batch 2: a near-copy of an INDEXED vector, plus a genuinely new one
    batch2 = _vecs(
        spark,
        [(10, b[1] + 0.01 * _base(3)[0]), (11, b[2])],
    )
    out2 = {r.vec_id for r in filt.process_batch(batch2).collect()}
    assert out2 == {11}  # 10 rejected against the index


def test_replay_idempotent_after_index_commit(spark, tmp_path):
    b = _base(4)
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idx2"), dim=DIM, threshold=0.95
    )
    batch = _vecs(spark, [(0, b[0]), (1, b[1])])
    first = {r.vec_id for r in filt.process_batch(batch).collect()}
    assert first == {0, 1}
    # replay the same batch (crash after append): everything now indexed
    replay = {r.vec_id for r in filt.process_batch(batch).collect()}
    assert replay == set()


def test_counts_match_recompute_and_survive_stale_stamp(spark, tmp_path):
    from pyspark.sql import functions as F

    b = _base(5, n=6)
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idx3"), dim=DIM, threshold=0.99
    )
    filt.process_batch(_vecs(spark, [(i, b[i]) for i in range(3)]))
    filt.process_batch(_vecs(spark, [(i + 10, b[i + 3]) for i in range(3)]))

    # incremental counts == full recompute over the index head
    got = {
        (r.band, r.key): r.cnt
        for r in filt.counts.read().select("band", "key", "cnt").collect()
    }
    want = {
        (r.band, r.key): r.cnt
        for r in filt._banded(
            filt.index.read().select(F.col("vec_id").alias("id"), "sig")
        )
        .groupBy("band", "key")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want
    assert filt.counts.read().agg(F.max("idx_version")).head()[0] == filt.index.latest_version()

    # stale stamp (simulated crash between append and counts overwrite):
    # the next batch detects the mismatch, rebuilds, and re-stamps
    filt.counts.overwrite(
        filt.counts.read().withColumn("idx_version", F.lit(-99))
    )
    filt.process_batch(_vecs(spark, [(100, 0.9 * b[0] + 0.45 * b[1])]))
    again = {
        (r.band, r.key): r.cnt
        for r in filt.counts.read().select("band", "key", "cnt").collect()
    }
    rebuilt = {
        (r.band, r.key): r.cnt
        for r in filt._banded(
            filt.index.read().select(F.col("vec_id").alias("id"), "sig")
        )
        .groupBy("band", "key")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert again == rebuilt


def test_oversized_index_buckets_dropped_not_fatal(spark, tmp_path):
    """With a tiny bucket_cap every index bucket is over cap — candidate
    generation degrades (recall valve) but admission still runs and
    within-batch exact verify keeps precision."""
    b = _base(6)
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idx4"), dim=DIM, threshold=0.95, bucket_cap=0
    )
    filt.process_batch(_vecs(spark, [(0, b[0])]))
    # near-copy of an indexed vector: the capped index join can't see it
    # (all buckets dropped) — documented recall trade, not a crash
    out = {
        r.vec_id
        for r in filt.process_batch(
            _vecs(spark, [(1, b[0] + 0.01 * _base(7)[0])])
        ).collect()
    }
    assert out == {1}


def test_stream_integration_available_now(spark, tmp_path):
    """End-to-end through a real readStream + foreachBatch drain."""
    b = _base(8)
    src = tmp_path / "src"
    _vecs(spark, [(0, b[0]), (1, b[0] + 0.005 * _base(9)[0]), (2, b[1])]).write.parquet(
        str(src)
    )
    admitted = []
    filt = StreamingEmbeddingNearDupFilter(
        spark,
        str(tmp_path / "idx5"),
        sink=lambda df, _e: admitted.extend(r.vec_id for r in df.collect()),
        dim=DIM,
        threshold=0.95,
    )
    stream = spark.readStream.schema("vec_id long, embedding array<double>").parquet(
        str(src)
    )
    q = (
        stream.writeStream.foreachBatch(lambda df, e: filt.process_batch(df, e))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(admitted) == [0, 2]


def test_index_hit_threshold_rounds_like_batch_pass(spark, tmp_path):
    """Knife-edge similarity: a cross-batch pair with RAW cosine just
    under the threshold but 6-dp-HALF_UP-rounding TO it must be rejected
    by the index-hit pass exactly as the within-batch pass
    (srp_neardup_pairs) would reject it — admission must not depend on
    which pass saw the pair (ADVICE r6)."""
    import math

    c = 0.8999998  # rounds to 0.900000 at 6 dp; raw compare would admit
    s = math.sqrt(1.0 - c * c)
    v1 = np.zeros(DIM)
    v1[0] = 1.0
    u = np.zeros(DIM)
    u[1] = 1.0
    v2 = c * v1 + s * u  # cosine(v1, v2) == c exactly (unit vectors)
    # bands == n_planes (1-bit bands): a 26° pair collides in SOME band
    # with probability 1 - (theta/pi)^24 ≈ 1 — candidate generation is
    # not the thing under test here
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idx"), dim=DIM, threshold=0.9, n_planes=24, bands=24
    )
    out1 = {r.vec_id for r in filt.process_batch(_vecs(spark, [(0, v1)])).collect()}
    assert out1 == {0}
    out2 = {r.vec_id for r in filt.process_batch(_vecs(spark, [(1, v2)])).collect()}
    assert out2 == set()  # rounded 0.900000 >= 0.9 → duplicate, rejected


def test_deferred_counts_fold_and_crash_catchup(spark, tmp_path):
    """fold_every=3: the counts table commits once per 3 batches (the
    amortized-commit knob), reads tolerate the ≤2-batch stamp lag, and a
    'crash' that loses pending occupancy self-repairs via the
    v_before-mismatch full rebuild on the next fold."""
    from pyspark.sql import functions as F

    from psy_supabase_spark.streaming.neardup import StreamingEmbeddingNearDupFilter

    b = _base(11, n=12)
    filt = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idxf"), dim=DIM, threshold=0.99, fold_every=3
    )

    def counts_version():
        return filt.counts.latest_version()

    filt.process_batch(_vecs(spark, [(0, b[0])]))
    v1 = counts_version()  # first batch folds (counts table created)
    filt.process_batch(_vecs(spark, [(1, b[1])]))
    filt.process_batch(_vecs(spark, [(2, b[2])]))
    assert counts_version() == v1  # deferred: no commit on batches 2-3
    filt.process_batch(_vecs(spark, [(3, b[3])]))
    assert counts_version() == v1 + 1  # 3 pending -> one fold

    def recomputed():
        return {
            (r.band, r.key): r.cnt
            for r in filt._banded(
                filt.index.read().select(F.col("vec_id").alias("id"), "sig")
            )
            .groupBy("band", "key")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

    got = {
        (r.band, r.key): r.cnt
        for r in filt.counts.read().select("band", "key", "cnt").collect()
    }
    assert got == recomputed()

    # crash: a NEW filter instance (pending lost, memo empty) over the
    # same paths — its first batch sees lag != len(pending) and folds
    # immediately via the full-rebuild path
    filt2 = StreamingEmbeddingNearDupFilter(
        spark, str(tmp_path / "idxf"), dim=DIM, threshold=0.99, fold_every=3
    )
    filt2.process_batch(_vecs(spark, [(4, b[4])]))
    filt2.process_batch(_vecs(spark, [(5, b[5])]))  # in-sync? lag rule decides
    got2 = {
        (r.band, r.key): r.cnt
        for r in filt2.counts.read().select("band", "key", "cnt").collect()
    }
    stamped = filt2.counts.read().agg(F.max("idx_version")).head()[0]
    lag = filt2.index.latest_version() - stamped
    assert 0 <= lag <= 2  # within the fold_every-1 tolerance
    # counts at its stamp == recompute over the index AT THAT VERSION
    idx_at = filt2.index.read(version=stamped)
    want2 = {
        (r.band, r.key): r.cnt
        for r in filt2._banded(idx_at.select(F.col("vec_id").alias("id"), "sig"))
        .groupBy("band", "key")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got2 == want2


def test_banding_config_guards(spark, tmp_path):
    """r14 review hardening: (a) a half-specified banding raises
    instead of pairing the given value with an auto partner suggested
    for a different plane count; (b) a non-divisible pair raises; (c) a
    restart whose SRP config differs from the stamp written by the
    index's builder raises instead of silently mis-banding the stored
    signatures (which admitted every cross-batch near-dup)."""
    import pytest

    with pytest.raises(ValueError, match="half-specified"):
        StreamingEmbeddingNearDupFilter(
            spark, str(tmp_path / "idx_half"), dim=DIM, n_planes=24,
            expected_n=100_000,
        )
    with pytest.raises(ValueError, match="divide"):
        StreamingEmbeddingNearDupFilter(
            spark, str(tmp_path / "idx_div"), dim=DIM, n_planes=24, bands=16
        )
    # build an index under one config, then restart under another
    b = _base(7)
    path = str(tmp_path / "idx_stamp")
    filt = StreamingEmbeddingNearDupFilter(
        spark, path, dim=DIM, threshold=0.95, n_planes=24, bands=8
    )
    filt.process_batch(_vecs(spark, [(0, b[0])]))
    # same config reattaches fine (stamp match)
    StreamingEmbeddingNearDupFilter(
        spark, path, dim=DIM, threshold=0.95, n_planes=24, bands=8
    )
    with pytest.raises(ValueError, match="banding mismatch"):
        StreamingEmbeddingNearDupFilter(
            spark, path, dim=DIM, threshold=0.95, n_planes=32, bands=8
        )
    with pytest.raises(ValueError, match="banding mismatch"):
        StreamingEmbeddingNearDupFilter(  # same shape, different seed
            spark, path, dim=DIM, threshold=0.95, n_planes=24, bands=8,
            seed=999,
        )
