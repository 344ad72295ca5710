"""Window semantics, esp. the reference's subtlest trap: the rolling
context frame excludes the current row and resets per partition key
(SURVEY.md §7 hard part 2)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from psy_supabase_spark.operators import windows


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, minute, second)


def test_rolling_context_excludes_current_row(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "d"), ("u1", 5, "e"),
        ("u2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id string, seq int, txt string")
    out = windows.rolling_context(
        df, partition_by="user_id", order_by=["seq"], render=F.col("txt"), n_turns=3
    )
    got = {(r.user_id, r.seq): r.context for r in out.collect()}
    assert got[("u1", 1)] is None          # no history → NULL
    assert got[("u1", 2)] == "a"
    assert got[("u1", 4)] == "a b c"
    assert got[("u1", 5)] == "b c d"       # window slides, current excluded
    assert got[("u2", 1)] is None          # resets across keys


def test_recent_per_key(spark):
    rows = [("u1", i) for i in range(1, 8)] + [("u2", 1)]
    df = spark.createDataFrame(rows, "user_id string, seq int")
    out = windows.recent_per_key(df, 2, partition_by="user_id", order_by=[F.col("seq").desc()])
    got = sorted((r.user_id, r.seq) for r in out.collect())
    assert got == [("u1", 6), ("u1", 7), ("u2", 1)]


def test_sessionize_gap(spark):
    rows = [
        (1, _ts(0)), (1, _ts(10)), (1, _ts(50)), (1, _ts(55)),  # gap at 50 (40min)
        (2, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.sessionize(df, gap_seconds=1800)
    got = {(r.user_id, r.ts.minute): r.session_idx for r in out.collect()}
    assert got[(1, 0)] == 0 and got[(1, 10)] == 0
    assert got[(1, 50)] == 1 and got[(1, 55)] == 1
    assert got[(2, 0)] == 0


def test_sessionize_boundary_exactly_gap_is_same_session(spark):
    rows = [(1, _ts(0)), (1, _ts(30))]  # exactly 1800s → NOT a new session (strict >)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = windows.sessionize(df, gap_seconds=1800)
    assert {r.session_idx for r in out.collect()} == {0}
