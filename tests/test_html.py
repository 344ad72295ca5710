"""HTML → text extraction (functions/html): extraction semantics, chain
order (no double-decode injection), DuckDB parity from the shared chain."""

from __future__ import annotations

import pytest

from psy_supabase_spark.functions.html import html_oracle_sql, html_to_text


CASES = [
    (
        "<html><head><style>p{color:red}</style><script src='x'>var a=1;\nvar b=2;"
        "</script></head><body><h1>Big Title</h1><p>First para &amp; more.</p>"
        "<p>Second &lt;tagged&gt; para</p><!-- hidden --><ul><li>one</li>"
        "<li>two</li></ul>&nbsp;tail&#39;s</body></html>",
        "Big Title\nFirst para & more.\nSecond <tagged> para\none\ntwo\ntail's",
    ),
    ("no markup at all", "no markup at all"),
    ("line<br>break<br/>s", "line\nbreak\ns"),
    ("", ""),
    ("entities only &quot;q&quot; &apos;a&apos; &gt;", "entities only \"q\" 'a' >"),
    # entity decode AFTER tag strip: encoded markup must NOT get stripped
    ("&lt;script&gt;evil()&lt;/script&gt;", "<script>evil()</script>"),
    # &amp; decodes LAST: "&amp;lt;" renders as the literal "&lt;", never "<"
    ("double &amp;lt; encoded &amp;amp; here", "double &lt; encoded &amp; here"),
    # whitespace collapse
    ("<p>a   b\t\tc</p>\n\n\n<p>d</p>", "a b c\nd"),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(CASES)], "i long, html string"
    )
    return {r["i"]: r["t"] for r in df.select("i", html_to_text("html").alias("t")).collect()}


def test_extraction_semantics(extracted):
    for i, (_, want) in enumerate(CASES):
        assert extracted[i] == want, (i, CASES[i][0], extracted[i])


def test_duckdb_parity_from_shared_chain(spark, extracted):
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE t (i BIGINT, html VARCHAR)")
    for i, (c, _) in enumerate(CASES):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, c])
    du = {
        int(r[0]): r[1]
        for r in con.sql(f"SELECT i, {html_oracle_sql('html')} FROM t").fetchall()
    }
    assert du == extracted


def test_chain_is_pure_codegen(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "i long, html string")
    plan = (
        df.select(html_to_text("html").alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Exchange" not in plan
