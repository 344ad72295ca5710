"""Window operators (SURVEY.md §2.5).

- ``rolling_context``: the reference's conversation-context builder
  (`utilities/text_utils.py:78-120`): per partition key, concatenate the
  previous ≤N rows' rendered text — current row EXCLUDED — in event order.
  The reference does this with a pandas deque on the driver; here it is a
  single window frame ``rowsBetween(-N, -1)``, which Spark executes after
  one shuffle on the partition key and a per-partition sort — linear at
  100 TB and skew-handled by AQE.
- ``recent_per_key``: last-k-rows-per-key slice (reference
  `rag_processor.py:109` last-5, `text_generator.py:350` last-2).
- ``sessionize``: gap-based session ids (lag + running sum), the batch
  twin of Structured Streaming's ``session_window`` (streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import epoch_micros


def rolling_context(
    df: DataFrame,
    *,
    partition_by: str,
    order_by: list[str],
    render: Column,
    n_turns: int = 3,
    out_col: str = "context",
) -> DataFrame:
    """Concat the previous ≤n_turns rendered rows into ``out_col``.

    Current row excluded (frame -n..-1, the reference's subtlest semantic:
    `text_utils.py:99-111`).  Rows with no history get NULL (the reference
    renders '' — NULL is the relational spelling and matches SQL oracles).
    """
    w = Window.partitionBy(partition_by).orderBy(*order_by).rowsBetween(-n_turns, -1)
    ctx = F.concat_ws(" ", F.collect_list(render).over(w))
    return df.withColumn(out_col, F.nullif(ctx, F.lit("")))


def recent_per_key(
    df: DataFrame,
    k: int,
    *,
    partition_by: str,
    order_by: list[Column],
    rank_col: str = "rn",
) -> DataFrame:
    """Last-k rows per key: row_number over a DESC ordering, keep rn ≤ k.
    Plans as one shuffle + per-partition sort; only k rows per key survive.
    """
    w = Window.partitionBy(partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign gap-based session indexes per user (0-based).

    new_session = ts - lag(ts) > gap; session_idx = running sum of flags.
    Identical semantics to Structured Streaming ``session_window`` with a
    watermark large enough to close every session — tested against it in
    tests/test_streaming.py.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # integer microsecond arithmetic: exact, and bit-portable to SQL oracles
    # (DuckDB epoch_us) — no float/second truncation at session boundaries.
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_new = F.when(
        prev_ts.isNull() | (epoch_micros(ts_col) - epoch_micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("_new", is_new).withColumn(session_col, F.sum("_new").over(running) - 1).drop("_new")
