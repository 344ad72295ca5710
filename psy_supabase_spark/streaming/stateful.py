"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's rolling conversation context (W1 — previous ≤3 turns per
conversation, `utilities/text_utils.py:78-120`) exists here in batch form
as a window frame (operators/windows.rolling_context).  Online, the same
semantics need per-key state that survives across micro-batches: this is
Spark's arbitrary-stateful-processing hook, with an explicit GroupState
holding the last N rendered turns per user.

State size is strictly bounded (N strings per live key) and keys expire
after ``state_ttl`` of PROCESSING-time silence (ProcessingTimeTimeout —
the wall clock of the running query, not event time; see the caveats
below) — the properties that keep the state store sane at 100 TB/day.

Caveats, stated rather than hidden (r14 review):

- **Ordering is per-micro-batch.** Rows sort by (ts, event_id) WITHIN
  each batch, but state rolls strictly forward across batches: an event
  whose ts precedes a turn already rolled into state in an earlier
  batch gets a context that includes that later turn, and the earlier
  turn never enters any later event's context — divergent from the
  batch `windows.rolling_context` answer.  Arrival order is the source
  order here; a source that can reorder across micro-batch boundaries
  (multi-partition Kafka) needs an upstream per-key sequencer if exact
  batch parity is required.  The watermark bounds state, not ordering.
- **Expiry is processing-time.** Under a fast historical backfill,
  weeks of event time pass in seconds of wall time, so no key times
  out and state holds every distinct key seen; expire-by-event-time
  would need EventTimeTimeout + per-key timeout timestamps.  For
  backfills, drain with availableNow (TTL off) and let the state be
  discarded with the checkpoint, or run the batch operator instead.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("context", T.StringType(), True),
    ]
)
STATE_SCHEMA = T.StructType([T.StructField("turns", T.ArrayType(T.StringType()), True)])


def _make_update_context(state_ttl_ms: int | None):
    """Build the per-group update fn; the TTL rides the closure to workers."""

    def update(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        """Per user: emit the concat of the previous ≤3 turns for every
        event (current row excluded — the W1 trap), then roll state
        forward.  Rows are (ts, event_id)-ordered WITHIN the
        micro-batch only; across batches state rolls forward in
        arrival order (module docstring, ordering caveat).  State
        carries only the trailing 3 turns."""
        (user_id,) = key
        if state.hasTimedOut:  # only reachable with a timeout conf enabled
            state.remove()
            return
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        turns: list[str] = list(state.get[0]) if state.exists else []
        out_ids: list[int] = []
        out_ctx: list[str | None] = []
        rows = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for _, row in rows.iterrows():
            out_ids.append(int(row["event_id"]))
            out_ctx.append(" ".join(turns) if turns else None)
            turns = (turns + [str(row["event_type"])])[-3:]
        state.update((turns,))
        if state_ttl_ms:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame({"event_id": out_ids, "user_id": user_id, "context": out_ctx})

    return update


# A continuous deployment sets state_ttl_ms (ProcessingTimeTimeout) so idle
# keys expire; availableNow drains leave it off — pending processing-time
# timeouts keep an availableNow query scheduling empty micro-batches long
# after the data is exhausted.
def rolling_context_stream(
    events: DataFrame, *, watermark: str = "1 hour", state_ttl_ms: int | None = None
) -> DataFrame:
    """Streaming W1: arbitrary stateful rolling context per user."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms else GroupStateTimeout.NoTimeout
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_context(state_ttl_ms),
            outputStructType=CONTEXT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
