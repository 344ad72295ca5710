"""Live cardinality of a stream in flight — the portable HLL sketch
(`operators/hll`) as a Structured Streaming aggregation.

The crawl-ops question "how many distinct URLs / hosts / digests has
this crawl ingested SO FAR?" needs an answer that updates per
micro-batch without ever recounting the stream.  `count(distinct)` is
not a legal streaming aggregation (unbounded state); the HLL register
build is — and with state that can never outgrow the sketch:

- `hll_registers`'s expression graph (md5 → bucket/rho →
  ``groupBy(bucket).agg(max(rho))``) is streaming-legal AS-IS: a
  stateful aggregation whose state is one row per occupied register,
  hard-bounded at n_groups × 2^b rows no matter how long the stream
  runs.  No watermark is needed and nothing is ever evicted — registers
  only ratchet upward, which is exactly HLL's merge semantics.
- Spark forbids chaining a second stateful aggregation
  (`hll_estimates`) onto the first in one streaming query, so the
  estimate runs on the SNAPSHOT: either the in-memory sink table the
  equivalence tests drain into, or the durable register table
  :func:`fold_registers_stream` maintains.

Durability story (:func:`fold_registers_stream`): update-mode register
DELTAS flow into ``foreachBatch``, which folds them into a
`sources/txlog.TxTable` by union + register-max + overwrite — O(sketch)
work per batch, not O(stream); a crashed batch leaves the table at its
previous committed version and the replayed batch folds to the
identical registers (max is idempotent), the `streaming/neardup`
transactional-admission pattern.  Yesterday's crawl and today's stream
then merge exactly via `hll_merge` / a union + max — nothing ever
recounts.

Scale: the only shuffle per micro-batch is the register aggregation
(≤ n_groups × 2^b rows of state touched); the fold job unions two
sketch-sized frames.  A 1000-executor ingest pays the md5 scan on its
own rows and nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import hll
from ..sources.txlog import TxTable

ColumnOrName = Column | str


def register_stream(
    stream: DataFrame,
    col: ColumnOrName,
    *,
    b: int = 12,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming register frame (by…, bucket, rho) over an unbounded
    stream — `operators.hll.hll_registers` verbatim (the expression
    graph is streaming-legal; see module docstring for why the state
    stays sketch-bounded).  Sink in ``update`` mode (deltas — feed
    :func:`fold_registers_stream`'s fold) or ``complete`` mode (full
    snapshot, for the in-memory equivalence harness)."""
    return hll.hll_registers(stream, col, b=b, by=by)


def fold_registers_stream(
    stream: DataFrame,
    col: ColumnOrName,
    *,
    table_root: str,
    checkpoint: str,
    b: int = 12,
    by: tuple[str, ...] = (),
    vacuum_every: int = 64,
    vacuum_retention_seconds: float = 3600.0,
):
    """``writeStream`` builder: maintain a DURABLE register table for a
    stream in flight.  Per micro-batch, the update-mode register deltas
    fold into the `TxTable` at ``table_root`` (union + register-max +
    overwrite — both sides sketch-sized).  Read the table any time with
    ``TxTable(spark, table_root).read()`` and estimate with
    `hll_estimates` (grouped) or `hll_estimate` (collected); the table
    is exactly `hll_registers` of everything ingested so far.

    Every ``vacuum_every``-th committed version also vacuums the table
    (r14 review: each fold writes a fresh sketch-sized snapshot whose
    predecessor's files nothing ever reclaimed — a batch-per-second
    stream accumulated ~86k snapshot copies per day, unbounded growth
    on exactly the forever-running streams this module advertises).
    Retained history is bounded at ~``vacuum_retention_seconds`` of
    versions; the retention window keeps the vacuum safe against the
    fold's own in-flight staging (single-writer streams may pass a
    smaller window).  Set ``vacuum_every=0`` to manage retention
    externally.

    Returns the un-started builder (caller picks the trigger, the
    test/ops pattern everywhere in `streaming/`)."""
    keys = list(by) + ["bucket"]

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        tx = TxTable(batch_df.sparkSession, table_root)
        if tx.latest_version() >= 0:
            merged = (
                tx.read()
                .unionByName(batch_df)
                .groupBy(*keys)
                .agg(F.max("rho").alias("rho"))
            )
        else:
            merged = batch_df
        new_v = tx.overwrite(merged)
        if vacuum_every and new_v % vacuum_every == 0:
            tx.vacuum(retention_seconds=vacuum_retention_seconds)

    return (
        register_stream(stream, col, b=b, by=by)
        .writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_fold)
    )
