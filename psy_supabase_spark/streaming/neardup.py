"""Streaming near-duplicate filtering: incremental LSH against a sketch index.

A training-data ingest stream must drop documents that near-duplicate
anything ALREADY ingested — not just within the current micro-batch.  No
built-in streaming operator expresses "stateful similarity join", and
row-level state (applyInPandasWithState) cannot coordinate a doc whose
band keys land in different state groups.  The production-shaped design is
instead: per micro-batch, a BATCH band-join of the incoming docs against an
accumulating sketch index, composed inside ``foreachBatch``:

1. sketch the batch (SimHash — one grouped aggregate, 8 bytes/doc);
2. reject docs whose sketch is within Hamming ``max_hamming`` of an
   indexed sketch (pigeonhole band equi-join, exact Hamming verify — the
   same provably-complete candidate generator as the batch operator);
3. among survivors, keep one representative per within-batch near-dup
   component (``connected_components`` on the batch pairs, min-id wins —
   first-occurrence semantics, deterministic);
4. transactionally append the admitted sketches to the index
   (`sources/txlog.TxTable`) — a crashed batch leaves the index unchanged,
   and the replayed batch recomputes the identical decision (idempotent).

Scale: the index join shuffles only (band, key, simhash) rows — 4 narrow
rows per indexed doc, independent of document size.  On a real cluster the
index table would be bucketed by (band, key) so the per-batch join
co-locates with zero index-side shuffle; growth is bounded by admitted
(post-dedup) volume only.  The mega-bucket valve's oversized-bucket scan
reads an incrementally-maintained (band, key, cnt, idx_version) side table
(one row per occupied bucket, folded forward per batch — O(batch) upkeep),
so no per-batch pass over the accumulating index remains anywhere in the
hot path; a version-stamp mismatch after a crash degrades to one full
recompute and self-repairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.txlog import TxTable


class StreamingNearDupFilter:
    """foreachBatch body: admit only docs that near-duplicate nothing seen.

    Usage::

        filt = StreamingNearDupFilter(spark, index_path, sink)
        stream.writeStream.foreachBatch(filt.process_batch).start()

    where ``sink(admitted_df, epoch_id)`` receives the admitted documents.
    """

    def __init__(
        self,
        spark,
        index_path: str,
        sink=None,
        *,
        max_hamming: int = 3,
        id_col: str = "doc_id",
        text_col: str = "text",
        bucket_cap: int | None = dedup.DEFAULT_BUCKET_CAP,
    ):
        self.index = TxTable(spark, index_path)
        # incrementally-maintained (band, key, cnt) bucket sizes of the
        # index — the valve's oversized-bucket scan reads THIS (one row
        # per occupied bucket) instead of re-aggregating the whole index
        # per micro-batch: O(batch) upkeep, not O(index).  Each overwrite
        # stamps the index version it reflects; a mismatch on read (crash
        # between index.append and the counts overwrite, or a pre-existing
        # index built without counts) falls back to one full recompute and
        # self-repairs on the next process_batch.
        self.counts = TxTable(spark, index_path.rstrip("/") + ".bucket_counts")
        self.sink = sink
        self.max_hamming = max_hamming
        self.id_col = id_col
        self.text_col = text_col
        self.bucket_cap = bucket_cap

    def _index_oversized(self, idx_banded: DataFrame) -> DataFrame | None:
        """The index's oversized (band, key) set for the valve — from the
        incrementally-maintained counts table when it is in sync with the
        index head, else one full recompute over ``idx_banded`` (the
        pre-counts / crashed-mid-update fallback; self-repairs on the
        next :meth:`process_batch`)."""
        if self.bucket_cap is None:
            return None
        if self.counts.latest_version() >= 0:
            counts = self.counts.read()
            stamped = counts.agg(F.max("idx_version")).head()[0]
            if stamped == self.index.latest_version():
                return (
                    counts.where(F.col("cnt") > self.bucket_cap)
                    .select("band", "key")
                )
        return dedup.oversized_buckets(idx_banded, self.bucket_cap)

    # -- pure decision function (static DF in, static DF out): unit-testable
    def admit(self, batch: DataFrame) -> DataFrame:
        """Docs from `batch` that survive both the index check and
        within-batch first-occurrence dedup.  Does NOT update the index."""
        sh = dedup.simhash(batch, id_col=self.id_col, text_col=self.text_col)
        banded = dedup.simhash_banded(sh, self.max_hamming)
        if self.index.latest_version() >= 0:
            idx = self.index.read().select(
                F.col(self.id_col).alias("id"), "simhash"
            )
            idx_banded = dedup.simhash_banded(idx, self.max_hamming)
            # mega-bucket valve: subdivide BOTH sides on the INDEX's
            # oversized (band, key) set — one shared set keeps the widened
            # join keys aligned across sides, and the index is the side
            # that grows without bound.  Completeness is preserved
            # (simhash_subdivided's pigeonhole-recursion argument).
            over = self._index_oversized(idx_banded)
            b_sub = dedup.simhash_subdivided(banded, self.max_hamming, over)
            i_sub = dedup.simhash_subdivided(idx_banded, self.max_hamming, over)
            ham = F.bit_count(F.col("b.simhash").bitwiseXOR(F.col("i.simhash")))
            hit_ids = (
                b_sub.alias("b")
                .join(i_sub.alias("i"), ["band", "key", "sband", "skey"])
                .where(ham <= self.max_hamming)
                .select(F.col("b.id").alias("id"))
                .distinct()
            )
            survivors = batch.join(
                hit_ids, batch[self.id_col] == hit_ids.id, "left_anti"
            )
        else:
            survivors = batch
        # within-batch: one representative (min id) per near-dup component
        pairs = dedup.simhash_neardup_pairs(
            survivors,
            self.max_hamming,
            id_col=self.id_col,
            text_col=self.text_col,
            bucket_cap=self.bucket_cap,
        )
        comp = dedup.connected_components(pairs)  # (id, component=min reachable)
        losers = comp.where(F.col("id") != F.col("component")).select("id")
        return survivors.join(
            losers, survivors[self.id_col] == losers.id, "left_anti"
        )

    def process_batch(self, batch: DataFrame, epoch_id: int | None = None) -> DataFrame:
        """The foreachBatch hook: decide, emit, THEN index — in that order.

        Replay-idempotence across every crash window:

        - crash before the sink ran: the index is unchanged, so the
          replayed batch recomputes the identical admit decision and
          emits it — nothing lost, nothing duplicated;
        - crash after the sink but before ``index.append`` committed:
          the replay re-admits and re-emits, and the sink's own
          idempotence (keyed upsert / txlog) absorbs the duplicate;
        - crash after the append committed: the replayed admit rejects
          the already-indexed docs, the sink receives an empty batch.

        Appending to the index FIRST would invert the middle window into
        silent permanent loss: the replayed admit would reject docs whose
        sketches committed even though the sink never saw them."""
        admitted = self.admit(batch)
        out = admitted.localCheckpoint(eager=True)  # decide BEFORE the index moves
        if self.sink is not None:
            self.sink(out, epoch_id)
        sketches = dedup.simhash(out, id_col=self.id_col, text_col=self.text_col).select(
            F.col("id").alias(self.id_col), "simhash"
        )
        v_before = self.index.latest_version()
        self.index.append(sketches)
        self._update_counts(sketches, v_before)
        return out

    def _update_counts(self, admitted_sketches: DataFrame, v_before: int) -> None:
        """Fold this batch's (band, key) occupancy into the counts table —
        O(batch) aggregate + a merge against one-row-per-occupied-bucket,
        stamped with the index version the result reflects.  Runs AFTER
        ``index.append``: a crash in between leaves a stale stamp, which
        the reader detects and survives via full recompute (see
        :meth:`_index_oversized`) — the valve is a performance device, so
        the fallback costs time, never correctness."""
        if self.bucket_cap is None:
            return
        batch_counts = (
            dedup.simhash_banded(
                admitted_sketches.select(
                    F.col(self.id_col).alias("id"), "simhash"
                ),
                self.max_hamming,
            )
            .groupBy("band", "key")
            .agg(F.count("*").alias("cnt"))
        )
        merged = None
        if self.counts.latest_version() >= 0:
            prior = self.counts.read()
            # incremental merge is valid ONLY if the stored counts reflect
            # the index exactly as it stood before this batch's append —
            # a stale stamp (earlier crash between append and overwrite)
            # would double-count or undercount, so rebuild instead
            if prior.agg(F.max("idx_version")).head()[0] == v_before:
                merged = (
                    prior.select("band", "key", "cnt")
                    .unionByName(batch_counts)
                    .groupBy("band", "key")
                    .agg(F.sum("cnt").alias("cnt"))
                )
        if merged is None:
            # first batch, or repair after a stamp mismatch / fresh counts
            # table next to a pre-existing index: rebuild from the index
            # head (the one allowed O(index) pass)
            merged = (
                dedup.simhash_banded(
                    self.index.read().select(
                        F.col(self.id_col).alias("id"), "simhash"
                    ),
                    self.max_hamming,
                )
                .groupBy("band", "key")
                .agg(F.count("*").alias("cnt"))
            )
        self.counts.overwrite(
            merged.withColumn("idx_version", F.lit(self.index.latest_version()))
        )
