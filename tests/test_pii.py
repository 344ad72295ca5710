"""PII redaction family: three-engine parity (Spark == DuckDB oracle ==
Python re on the shared patterns), redaction invariants, and the
no-Exchange plan shape of the map-side pass."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_counts_oracle_sql,
    pii_oracle_sql,
    redact_pii,
)

SAMPLES = [
    "reach me at john.doe+spam@ex-ample.co.uk or 10.0.255.1 now",
    "ssn 123-45-6789 phone +1 555-867-5309 and 555 123 4567",
    "no pii here, just v1.2 and a@b (not an email), 1.2.3.4.5 run",
    "edge: 999.999.999.999 and 12-34-5678 and x@y.zz",
    "double jane@x.org bob@y.io same line 192.168.0.1 10.0.0.2",
    "call +1 555-867-5309 or 1-800-555-1234 or +1.555.123.4567",
    "not phones: 12 555-867-530 and x2555-123-4567y",
    "",
]


def _spark_rows(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    counts = pii_counts("text")
    return df.select(
        redact_pii("text").alias("red"),
        *[counts[n].alias(n) for n, _p, _t in PII_PATTERNS],
    ).collect()


def test_three_engine_parity(spark):
    rows = _spark_rows(spark, SAMPLES)
    con = duckdb.connect()
    for s, row in zip(SAMPLES, rows):
        duck = con.execute(
            "SELECT {} AS red, {} FROM (SELECT ? AS t)".format(
                pii_oracle_sql("t"),
                ", ".join(f"{e} AS {n}" for n, e in pii_counts_oracle_sql("t")),
            ),
            [s],
        ).fetchone()
        py = s
        for _n, pat, tok in PII_PATTERNS:
            py = re.sub(pat, tok, py)
        py_counts = [len(re.findall(p, s)) for _n, p, _t in PII_PATTERNS]
        assert row.red == duck[0] == py, s
        assert [row[n] for n, _p, _t in PII_PATTERNS] == list(duck[1:]) == py_counts, s


def test_redaction_is_idempotent_and_total(spark):
    rows = _spark_rows(spark, SAMPLES)
    # no family pattern survives its own redaction pass
    for row in rows:
        for _n, pat, _t in PII_PATTERNS:
            assert not re.search(pat, row.red)
    # re-redacting a redacted text is a no-op
    once = [r.red for r in rows]
    again = [r.red for r in _spark_rows(spark, once)]
    assert once == again


def test_counts_match_redaction_evidence(spark):
    s = "double jane@x.org bob@y.io same line 192.168.0.1 10.0.0.2"
    (row,) = _spark_rows(spark, [s])
    assert row.email == 2 and row.ipv4 == 2 and row.red.count("[EMAIL]") == 2


def test_pii_pass_is_exchange_free(spark):
    df = spark.createDataFrame([("x",)], "text string").select(
        redact_pii("text").alias("r"), pii_counts("text").alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fuzzed_three_engine_parity(spark):
    """200 seeded adversarial strings (random splices of PII-ish atoms,
    separators, and noise) — Spark, DuckDB, and Python re must agree on
    every redaction and every count.  One batch, three engines."""
    import random

    rng = random.Random(20260814)
    atoms = [
        "a@b.co", "x.y+z@mail.example.org", "user@@double.at", "@nodomain",
        "10.0.0.1", "999.999.999.999", "1.2.3.4.5", "1.2.3", "256.1.1.1",
        "123-45-6789", "12-345-6789", "123-456-789", "000-00-0000",
        "555-867-5309", "+1 555-867-5309", "1-800-555-1234", "+1.555.123.4567",
        "555 123 4567", "5551234567", "55-12-34", "v1.2.3", "ver 10.0",
        "word", "two words", "", ".", "-", "@", "+1", "call", "at",
    ]
    seps = [" ", "  ", ", ", ". ", " x", "x ", "\t", " (", ") "]
    texts = []
    for _ in range(200):
        k = rng.randint(1, 8)
        texts.append(
            "".join(rng.choice(atoms) + rng.choice(seps) for _ in range(k)).strip()
        )

    rows = _spark_rows(spark, texts)
    con = duckdb.connect()
    sql = "SELECT {} AS red, {} FROM (SELECT ? AS t)".format(
        pii_oracle_sql("t"),
        ", ".join(f"{e} AS {n}" for n, e in pii_counts_oracle_sql("t")),
    )
    for s, row in zip(texts, rows):
        duck = con.execute(sql, [s]).fetchone()
        py = s
        for _n, pat, tok in PII_PATTERNS:
            py = re.sub(pat, tok, py)
        py_counts = [len(re.findall(p, s)) for _n, p, _t in PII_PATTERNS]
        assert row.red == duck[0] == py, s
        assert [row[n] for n, _p, _t in PII_PATTERNS] == list(duck[1:]) == py_counts, s
