"""As-of / range join semantics: ties match (<=), no-prior rows get NULL,
and the bucketed range join equals the plain inequality join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from psy_supabase_spark.operators.asof import asof_join, range_join_count


def _t(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute)


def test_asof_basic_ties_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "l1"), (1, _t(10), "l2"), (1, _t(1), "l0"), (2, _t(5), "lx")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(3), 100), (1, _t(10), 200), (2, _t(6), 300)],
        "user_id long, ts timestamp, payload long",
    )
    out = {r.tag: (r.payload_asof, r.ts_asof) for r in asof_join(left, right, on="user_id").collect()}
    assert out["l0"] == (None, None)          # nothing at or before t1
    assert out["l1"][0] == 100                # latest at/before t5 is t3
    assert out["l2"][0] == 200                # exact tie at t10 matches (<=)
    assert out["lx"] == (None, None)          # right row is AFTER the left row


def test_asof_takes_latest_not_any(spark):
    left = spark.createDataFrame([(1, _t(30), "L")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _t(k), k) for k in (1, 7, 22, 29)], "user_id long, ts timestamp, payload long"
    )
    row = asof_join(left, right, on="user_id").head()
    assert row.payload_asof == 29


def test_asof_null_payload_in_latest_row_stays_null(spark):
    # the latest matching right row has payload NULL and note set; BOTH
    # carried columns must come from that row — no per-column back-fill
    # from the older (payload=7, note='old') row.
    left = spark.createDataFrame([(1, _t(30), "L")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _t(10), 7, "old"), (1, _t(20), None, "new")],
        "user_id long, ts timestamp, payload long, note string",
    )
    row = asof_join(left, right, on="user_id").head()
    assert row.payload_asof is None
    assert row.note_asof == "new"
    assert row.ts_asof == _t(20)


def test_range_join_keeps_duplicate_left_rows(spark):
    # two fully-identical left rows must produce two output rows, each with
    # its OWN count — not one collapsed row with a doubled count.
    left = spark.createDataFrame(
        [(1, _t(0), "dup"), (1, _t(0), "dup")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame([(1, _t(5))], "user_id long, ts timestamp")
    rows = range_join_count(left, right, on="user_id", ts="ts", window_seconds=600).collect()
    assert [r.n_in_range for r in rows] == [1, 1]


def test_range_join_equals_inequality_join(spark):
    left = spark.createDataFrame(
        [(u, _t(m), f"s{u}{m}") for u in (1, 2) for m in (0, 30, 59)],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(u, _t(m)) for u in (1, 2) for m in range(0, 60, 7)], "user_id long, ts timestamp"
    )
    got = {r.tag: r.n_in_range for r in range_join_count(left, right, on="user_id", ts="ts", window_seconds=600).collect()}
    joined = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.unix_micros(F.col("r.ts")) < F.unix_micros(F.col("l.ts")) + 600 * 1_000_000),
        "left",
    )
    want = {
        r.tag: r.n
        for r in joined.groupBy("tag").agg(F.count(F.col("r.ts")).alias("n")).collect()
    }
    assert got == want
