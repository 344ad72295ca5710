"""Corpus-level line dedup: first-occurrence-wins across documents,
in-order reassembly, blank-line passthrough, all-dropped docs survive,
DuckDB parity, and the partial-agg (skew-benign) plan shape."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from psy_supabase_spark.operators.dedup import dedup_lines

DOCS = [
    (1, "unique alpha\nSHARED BOILERPLATE\nunique beta"),
    (2, "SHARED BOILERPLATE\nunique gamma"),
    (3, "SHARED BOILERPLATE"),           # every line a later duplicate
    (4, "unique delta\n\nunique epsilon"),  # blank separator preserved
    (5, "unique alpha"),                  # dup of doc 1's first line
]


def _run(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r.doc_id: r for r in dedup_lines(df).collect()}


def test_first_occurrence_wins_and_reassembles_in_order(spark):
    out = _run(spark)
    assert out[1].text == "unique alpha\nSHARED BOILERPLATE\nunique beta"
    assert out[2].text == "unique gamma"
    assert out[2].n_lines_dropped == 1
    assert out[5].text == "" and out[5].n_lines_dropped == 1


def test_all_dropped_doc_survives_empty(spark):
    out = _run(spark)
    assert out[3].text == "" and out[3].n_lines_kept == 0 and out[3].n_lines_dropped == 1


def test_blank_lines_are_structure_not_boilerplate(spark):
    out = _run(spark)
    # the blank line is kept verbatim even though blanks repeat corpus-wide
    assert out[4].text == "unique delta\n\nunique epsilon"
    assert out[4].n_lines_dropped == 0


def test_matches_duckdb_reference(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = {
        r[0]: r[1]
        for r in con.execute("""
            WITH lines AS (
              SELECT doc_id, generate_subscripts(l, 1) - 1 AS line_no, unnest(l) AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM d)
            ),
            winners AS (
              SELECT line, min(ROW(doc_id, line_no)) AS w FROM lines
              WHERE length(trim(line)) >= 1 GROUP BY line
            ),
            kept AS (
              SELECT l.doc_id, l.line_no, l.line FROM lines l JOIN winners w
              ON l.line = w.line AND ROW(l.doc_id, l.line_no) = w.w
              UNION ALL
              SELECT doc_id, line_no, line FROM lines WHERE length(trim(line)) < 1
            )
            SELECT d.doc_id,
                   COALESCE(string_agg(k.line, chr(10) ORDER BY k.line_no), '') AS text
            FROM d LEFT JOIN kept k USING (doc_id) GROUP BY d.doc_id
        """).fetchall()
    }
    got = {i: r.text for i, r in _run(spark).items()}
    assert got == want


def test_hot_line_reduces_map_side(spark):
    # the dedup group key aggregates with a partial (map-side) stage, so a
    # degenerate hot line never concentrates raw rows on one reducer
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final on the line key
    assert "CartesianProduct" not in plan
