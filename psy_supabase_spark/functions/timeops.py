"""Timestamp-type-tolerant time arithmetic.

Parquet written with ``isAdjustedToUTC=false`` loads as TIMESTAMP_NTZ on
Spark 4.x, and builtins like ``unix_micros`` hard-require TIMESTAMP —
an AnalysisException at plan time.  Every operator doing epoch arithmetic
goes through :func:`epoch_micros`, which accepts either type: the
NTZ→TIMESTAMP cast is value-preserving because the engine pins the session
timezone to UTC (session.py:35), matching the naive-µs semantics of the
DuckDB oracle on the same files.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP **or** TIMESTAMP_NTZ input.

    ``cast("timestamp")`` is a no-op on TIMESTAMP and a UTC-pinned
    reinterpretation on TIMESTAMP_NTZ; both reach ``unix_micros`` legal.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
