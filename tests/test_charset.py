"""Charset sniffing + transcoding (functions/charset): priority order,
alias folding, DuckDB regex parity, split-path decode correctness, and
the JVM-leg plan contract."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from psy_supabase_spark.functions import charset as CS


def _sniff(spark, headers: str, body: bytes) -> str:
    df = spark.createDataFrame(
        [(headers, body)], "headers string, payload binary"
    )
    return df.select(
        CS.sniff_charset("headers", CS.latin1_view("payload")).alias("cs")
    ).collect()[0].cs


def test_sniff_priority_and_aliases(spark):
    ct = "Content-Type: text/html; charset=ISO-8859-1\r\n"
    meta = b'<html><head><meta charset="Shift-JIS"></head>x'
    # BOM beats header beats meta
    assert _sniff(spark, ct, b"\xef\xbb\xbfhi") == "utf-8"
    assert _sniff(spark, ct, b"\xff\xfeh\x00") == "utf-16-le"
    assert _sniff(spark, ct, b"\xfe\xff\x00h") == "utf-16-be"
    # WHATWG direction: the latin-1 label family decodes as cp1252
    assert _sniff(spark, ct, meta) == "windows-1252"
    assert _sniff(spark, "Content-Type: text/html\r\n", meta) == "shift_jis"
    # quoted + aliased header value
    assert _sniff(
        spark, 'Content-Type: text/html; charset="CP1252"\r\n', b"x"
    ) == "windows-1252"
    # nothing anywhere -> the WHATWG default
    assert _sniff(spark, "Content-Type: text/html\r\n", b"plain") == "utf-8"
    # http-equiv spelling of the meta tag
    assert _sniff(
        spark,
        "",
        b'<meta http-equiv="Content-Type" content="text/html; charset=gb-2312">',
    ) == "gbk"  # WHATWG: gb2312 labels decode as GBK, its superset


def test_sniff_header_anchors_to_content_type_line(spark):
    """A charset= in some OTHER header (a link URL, a cookie) must not
    win over the Content-Type line — and a block with no Content-Type
    charset falls through to the meta/default chain."""
    h = (
        "Link: <http://e.x/p?charset=big5>; rel=alternate\r\n"
        "Content-Type: text/html; charset=utf-8\r\n"
    )
    assert _sniff(spark, h, b"<p>x</p>") == "utf-8"
    h2 = "Link: <http://e.x/p?charset=big5>; rel=alternate\r\n"
    assert _sniff(spark, h2, b'<meta charset="shift-jis">') == "shift_jis"


def test_sniff_meta_requires_charset_attribute_delimiter(spark):
    """'data-charset=...' is not a charset declaration, and a charset=
    in a LATER tag (past the meta's '>') must not match."""
    assert _sniff(
        spark, "", b'<meta data-charset="big5" name="x"><p>y</p>'
    ) == "utf-8"
    assert _sniff(
        spark, "", b'<meta name="a"><span>charset=big5</span>'
    ) == "utf-8"


def test_sniff_duckdb_parity(spark):
    """Same verdicts from sniff_charset_sql over ASCII header/body
    strings (the oracle regime)."""
    cases = [
        ("Content-Type: text/html; charset=UTF8", "<p>x</p>"),
        ("Content-Type: text/html; charset='latin1'", "<p>x</p>"),
        ("Content-Type: text/html", '<meta charset="EUC_JP">'),
        ("Content-Type: text/html", "<meta CHARSET=x-sjis>"),
        ("", "no markers at all"),
        ("Content-Type: a; charset=win-1252", "<meta charset=utf8>"),
    ]
    df = spark.createDataFrame(cases, "headers string, body string")
    got = [
        r.cs
        for r in df.select(
            CS.sniff_charset("headers", "body").alias("cs")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (headers VARCHAR, body VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", cases)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {CS.sniff_charset_sql('headers', 'body')} FROM t"
        ).fetchall()
    ]
    assert got == want == [
        "utf-8", "windows-1252", "euc-jp", "shift_jis", "utf-8",
        "windows-1252",
    ]


def test_decode_split_path(spark):
    rows = [
        (1, "héllo wörld".encode("windows-1252"), "windows-1252"),
        (2, "日本語テキスト".encode("shift_jis"), "shift_jis"),
        (3, "plain ascii".encode("ascii"), "us-ascii"),
        (4, "ünïcode utf8".encode("utf-8"), "utf-8"),
        (5, b"\xef\xbb\xbfbom utf8", "utf-8"),
        (6, "中文内容".encode("gb2312"), "gb2312"),
        (7, b"garbage label bytes", "not-a-charset"),
        (8, "utf16 text".encode("utf-16-le"), "utf-16-le"),
        (9, None, "utf-8"),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary, charset string")
    got = {
        r.id: r.text for r in CS.decode_text(df).select("id", "text").collect()
    }
    assert got[1] == "héllo wörld"
    assert got[2] == "日本語テキスト"
    assert got[3] == "plain ascii"
    assert got[4] == "ünïcode utf8"
    assert got[5] == "bom utf8"          # BOM stripped on the JVM path
    assert got[6] == "中文内容"
    assert got[7] == "garbage label bytes"   # unknown label -> utf-8 fallback
    assert got[8] == "utf16 text"
    assert got[9] is None
    assert len(got) == len(rows)


def test_decode_malformed_bytes_replace(spark):
    df = spark.createDataFrame(
        [(1, b"ok \xff\xfe\xfa broken", "utf-8")],
        "id int, payload binary, charset string",
    )
    text = CS.decode_text(df).collect()[0].text
    assert text.startswith("ok ") and "�" in text and "broken" in text


def test_jvm_leg_has_no_python(spark):
    """The utf-8 majority path must stay whole-stage codegen: filter +
    decode only, no Eval/ArrowEvalPython on that branch."""
    df = spark.createDataFrame(
        [(1, b"x", "utf-8")], "id int, payload binary, charset string"
    )
    cs = F.coalesce(F.col("charset"), F.lit("utf-8"))
    jvm_leg = df.where(cs.isin("utf-8", "us-ascii")).withColumn(
        "text", F.make_valid_utf8(F.col("payload").cast("string"))
    )
    plan = jvm_leg._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_sniff_plan_is_codegen(spark):
    df = spark.createDataFrame(
        [("h", b"b")], "headers string, payload binary"
    )
    plan = (
        df.select(CS.sniff_charset("headers", CS.latin1_view("payload")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
