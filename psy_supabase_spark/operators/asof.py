"""As-of join — the time-series operator Spark lacks natively.

For every left row, attach the latest right row with
``right.ts <= left.ts`` (per key).  The naive spelling is a range join
(O(N·M) pairs) or a per-row correlated subquery; the scalable spelling
used here is the union trick:

    union(left tagged 0, right tagged 1)
    → one window sort per key on (ts, tag)
    → last_value(right payload, ignorenulls) carried forward
    → keep left rows

One shuffle on the key, one sort, zero joins — linear at 100 TB and
skew-handled like any window.  DuckDB's native ``ASOF JOIN`` provides the
oracle.  Ties (right.ts == left.ts) match, per ASOF semantics — the
union orders the right row first via the tag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeops import epoch_micros


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "ts",
    window_seconds: int = 3600,
    count_col: str = "n_in_range",
) -> DataFrame:
    """Per left row: count right rows of the same key with
    ``left.ts <= right.ts < left.ts + window``.

    The naive spelling is an inequality join (O(N·M) worst case); the
    scalable spelling buckets both sides into window-sized time buckets
    and equi-joins on (key, bucket) for the two buckets a window can
    touch, then applies the exact range filter — candidates are bounded
    by temporal locality instead of key cardinality.
    """
    def bucket(c: str):
        return F.floor(epoch_micros(c) / F.lit(window_seconds * 1_000_000))

    # _lid keeps fully-duplicate left rows distinct through the groupBy —
    # the contract is one output row per left INPUT row, not per distinct
    # left value (uniqueness within this query is all that's needed).
    l = left.select(
        F.monotonically_increasing_id().alias("_lid"),
        on,
        F.col(ts).alias("_lts"),
        F.struct(*left.columns).alias("_left"),
        bucket(ts).alias("_b"),
    )
    r = right.select(on, F.col(ts).alias("_rts"), bucket(ts).alias("_rb"))
    # a [t, t+w) window starting in bucket b only touches buckets b and b+1
    r0 = r.select(on, "_rts", F.col("_rb").alias("_jb"))
    r1 = r.select(on, "_rts", (F.col("_rb") - 1).alias("_jb"))
    cand = l.withColumnRenamed("_b", "_jb").join(r0.unionByName(r1), [on, "_jb"], "left")
    in_range = (F.col("_rts") >= F.col("_lts")) & (
        epoch_micros("_rts") < epoch_micros("_lts") + window_seconds * 1_000_000
    )
    counted = cand.groupBy("_lid", on, "_lts", "_left").agg(
        F.sum(F.when(in_range, 1).otherwise(0)).cast("bigint").alias(count_col)
    )
    return counted.select(F.col("_left.*"), count_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with right.ts <= left.ts per key.

    right_cols: right payload columns to carry (default: all but key/ts).
    Carried columns are renamed with ``suffix`` (plus ``ts{suffix}``).
    Left rows with no prior right row keep NULL payloads.
    """
    payload = right_cols or [c for c in right.columns if c not in (on, ts)]
    # The whole right payload travels as ONE struct so a single
    # last(ignorenulls) carries it: every output column comes from the
    # same, truly-latest right row, and a genuinely-NULL payload field in
    # that row stays NULL (per-column carry would back-fill it from an
    # older right row — diverging from ASOF JOIN semantics).
    r_struct = F.struct(F.col(ts).alias("_rts"), *[F.col(c) for c in payload])
    r_struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType.simpleString()
    l_tag = left.select(
        on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(l_tag.schema["_left"].dataType.simpleString()).alias("_left"),
        r_struct.alias("_r"),
    )
    # right rows sort BEFORE left rows at equal ts (_is_right DESC) so an
    # exact-tie right row is visible to the left row — ASOF `<=` semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        on,
        "_is_right",
        "_left",
        F.last("_r", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.where(F.col("_is_right") == 0).select(
        F.col("_left.*"),
        *[F.col(f"_c.{c}").alias(f"{c}{suffix}") for c in payload],
        F.col("_c._rts").alias(f"ts{suffix}"),
    )
    return out
