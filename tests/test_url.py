"""URL extraction + domain blocklist: host parsing, subdomain-suffix
semantics, audit flag, map-side plan, and stream-safety by construction."""

from __future__ import annotations

from pyspark.sql import functions as F

from psy_supabase_spark.functions.url import (
    blocklist_filter,
    extract_urls,
    is_blocked,
    url_hosts,
)

DOCS = [
    (0, "see https://ads.example.com/track?id=1 and http://ok.org/page"),
    (1, "plain www.Example.COM mention and https://sub.deep.example.com:8080/x"),
    (2, "no urls at all here"),
    (3, "https://notexample.com/legit and www.fine.io"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hosts_extracted_lowercase_distinct(spark):
    rows = {r.doc_id: r.h for r in _df(spark).select("doc_id", url_hosts("text").alias("h")).collect()}
    assert rows[0] == ["ads.example.com", "ok.org"]
    assert rows[1] == ["example.com", "sub.deep.example.com"]
    assert rows[2] == []


def test_subdomain_suffix_semantics(spark):
    flagged = {
        r.doc_id
        for r in _df(spark).where(is_blocked("text", ["example.com"])).collect()
    }
    # subdomains inherit (0: ads., 1: bare + sub.deep.) but notexample.com
    # must NOT match the example.com entry
    assert flagged == {0, 1}


def test_filter_and_audit_flag_agree(spark):
    docs = _df(spark)
    kept = {r.doc_id for r in blocklist_filter(docs, ["example.com"]).collect()}
    audited = blocklist_filter(docs, ["example.com"], keep_flag="blocked")
    flagged = {r.doc_id for r in audited.where("blocked").collect()}
    assert kept == {2, 3} and flagged == {0, 1}
    assert audited.count() == len(DOCS)


def test_blocklist_pass_is_exchange_free(spark):
    plan = (
        blocklist_filter(_df(spark), ["example.com"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_empty_blocklist_blocks_nothing(spark):
    assert blocklist_filter(_df(spark), []).count() == len(DOCS)


# ---------------------------------------------------------- eTLD+1

def test_registrable_domain_cases(spark):
    from psy_supabase_spark.functions.url import registrable_domain

    cases = [
        ("news.BBC.co.uk", "bbc.co.uk"),          # multi-label suffix
        ("a.b.example.com", "example.com"),       # default rule
        ("example.com", "example.com"),           # already registrable
        ("user.github.io", "user.github.io"),     # private registry
        ("deep.user.github.io", "user.github.io"),
        ("com", None),                            # bare TLD
        ("co.uk", None),                          # host IS a suffix
        ("localhost", None),                      # single label
        ("w3.org", "w3.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r.d for r in df.select(registrable_domain("host").alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_registrable_domain_duckdb_parity(spark):
    import duckdb

    from psy_supabase_spark.functions.url import (
        registrable_domain, registrable_domain_sql,
    )

    hosts = [
        "news.bbc.co.uk", "x.y.z.com.au", "a.blogspot.com", "b.example.org",
        "co.uk", "uk", "single", "app.herokuapp.com", "d.e.f.gov.uk",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = [r.d for r in df.select(registrable_domain("host").alias("d")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (host VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h in hosts])
    want = [r[0] for r in con.execute(
        f"SELECT {registrable_domain_sql('host')} FROM t"
    ).fetchall()]
    assert got == want


def test_registrable_domain_custom_suffixes_and_plan(spark):
    from psy_supabase_spark.functions.url import registrable_domain

    df = spark.createDataFrame([("a.b.custom.tld",)], "host string")
    out = df.select(
        registrable_domain("host", suffixes=("custom.tld",)).alias("d")
    )
    assert out.collect()[0].d == "b.custom.tld"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
