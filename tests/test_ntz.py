"""TIMESTAMP_NTZ tolerance regression tests.

Spark 4.x reads parquet ``timestamp[us]`` written without the UTC flag as
TIMESTAMP_NTZ; round-3 shipped with ``unix_micros`` failing on those inputs
(driver rows sessionize_gap30m / range_join_clicks_after_signup + the whole
bench).  Two defense layers, both pinned here:

1. the catalog normalizes every NTZ column to TIMESTAMP at load time;
2. the time-arithmetic operators are NTZ-tolerant even when fed a raw
   (un-normalized) frame.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from psy_supabase_spark.operators import asof, windows
from psy_supabase_spark.sources.catalog import load_table

from conftest import SF_SMOKE


def test_catalog_loads_events_ts_as_timestamp(spark):
    dtypes = dict(load_table(spark, SF_SMOKE, "events").dtypes)
    assert dtypes["ts"] == "timestamp", dtypes


def test_catalog_normalizes_ntz_on_every_table(spark):
    for name in ("orders", "lineitem", "documents", "events"):
        for col, typ in load_table(spark, SF_SMOKE, name).dtypes:
            assert typ != "timestamp_ntz", (name, col, typ)


def _frames(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0)),
        (1, datetime(2024, 1, 1, 0, 10)),
        (1, datetime(2024, 1, 1, 1, 50)),
        (2, datetime(2024, 1, 1, 0, 5)),
    ]
    tz = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ntz = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    return tz, ntz


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sessionize_accepts_ntz(spark):
    tz, ntz = _frames(spark)
    assert _rows(windows.sessionize(ntz, gap_seconds=1800)) == _rows(
        windows.sessionize(tz, gap_seconds=1800)
    )


def test_range_join_count_accepts_ntz(spark):
    tz, ntz = _frames(spark)
    got_ntz = asof.range_join_count(ntz, ntz, on="user_id", window_seconds=3600)
    got_tz = asof.range_join_count(tz, tz, on="user_id", window_seconds=3600)
    assert _rows(got_ntz) == _rows(got_tz)


def test_asof_join_accepts_ntz(spark):
    tz, ntz = _frames(spark)
    r_tz = tz.withColumn("payload", F.col("user_id") * 10)
    r_ntz = ntz.withColumn("payload", F.col("user_id") * 10)
    assert _rows(asof.asof_join(ntz, r_ntz, on="user_id")) == _rows(
        asof.asof_join(tz, r_tz, on="user_id")
    )
