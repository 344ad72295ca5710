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


def test_psl_wildcard_and_exception_vectors(spark):
    """The PSL documentation's own checkPublicSuffix test vectors for
    the wildcard (*.mm, *.ck) and exception (!www.ck) rule classes —
    in BOTH engines (r11 verdict: these rule kinds were documented
    out)."""
    import duckdb

    from psy_supabase_spark.functions.url import (
        registrable_domain, registrable_domain_sql,
    )

    cases = [
        # unlisted TLD / default rule (PSL: "example", "example.example")
        ("example", None),
        ("example.example", "example.example"),
        ("b.example.example", "example.example"),
        # *.mm wildcard: any single label under mm is a public suffix
        ("mm", None),
        ("c.mm", None),
        ("b.c.mm", "b.c.mm"),
        ("a.b.c.mm", "b.c.mm"),
        # *.ck with !www.ck exception
        ("ck", None),
        ("test.ck", None),
        ("b.test.ck", "b.test.ck"),
        ("a.b.test.ck", "b.test.ck"),
        ("www.ck", "www.ck"),
        ("www.www.ck", "www.ck"),
        ("WwW.ck", "www.ck"),                     # case-insensitive
        # listed literal (jp) still wins over nothing special
        ("jp", None),
        ("test.jp", "test.jp"),
        ("www.test.jp", "test.jp"),
        ("ac.jp", None),
        ("test.ac.jp", "test.ac.jp"),
        ("www.test.ac.jp", "test.ac.jp"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r.d for r in df.select(registrable_domain("host").alias("d")).collect()]
    assert got == [want for _, want in cases]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (host VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(h,) for h, _ in cases])
    want_sql = [r[0] for r in con.execute(
        f"SELECT {registrable_domain_sql('host')} FROM t"
    ).fetchall()]
    assert got == want_sql


def test_load_public_suffix_list_format(spark):
    """Parses the published file format: // comments, sections, blank
    lines, read-to-first-whitespace, wildcard/exception verbatim."""
    from psy_supabase_spark.functions.url import (
        load_public_suffix_list, registrable_domain,
    )

    text = (
        "// ===BEGIN ICANN DOMAINS===\n"
        "// ck : https://en.wikipedia.org/wiki/.ck\n"
        "*.ck\n"
        "!www.ck\n"
        "\n"
        "COM trailing-garbage-after-whitespace\n"
        "co.uk\n"
        "// ===END ICANN DOMAINS===\n"
    )
    rules = load_public_suffix_list(text)
    assert rules == ("*.ck", "!www.ck", "com", "co.uk")
    # Unicode (IDN) rules are twinned with their punycode wire form so
    # crawled (ASCII) hostnames match the suffix
    idn = load_public_suffix_list("中国\n*.テスト\n")
    assert idn == ("中国", "xn--fiqs8s", "*.テスト", "*.xn--zckzah")
    df2 = spark.createDataFrame(
        [("shop.example.xn--fiqs8s",), ("a.b.xn--zckzah",)], "host string"
    )
    got2 = [
        r.d
        for r in df2.select(
            registrable_domain("host", suffixes=idn).alias("d")
        ).collect()
    ]
    assert got2 == ["example.xn--fiqs8s", "a.b.xn--zckzah"]
    df = spark.createDataFrame(
        [("a.b.ck",), ("www.ck",), ("x.example.co.uk",)], "host string"
    )
    got = [
        r.d
        for r in df.select(
            registrable_domain("host", suffixes=rules).alias("d")
        ).collect()
    ]
    assert got == ["a.b.ck", "www.ck", "example.co.uk"]


def test_domain_degrees_wildcard_tld(spark):
    """domain_degrees groups a wildcard-TLD host at the right level:
    links from pages on a.shop.mm must roll up to shop's registrable
    domain a.shop.mm (shop.mm is a public suffix under *.mm), not to
    shop.mm (r11 verdict 'done when')."""
    from psy_supabase_spark.operators.linkgraph import domain_degrees

    links = spark.createDataFrame(
        [("http://x.a.shop.mm/p1", "http://b.example.com/q"),
         ("http://y.a.shop.mm/p2", "http://b.example.com/r")],
        "target_uri string, link_url string",
    )
    got = {r.domain: (r.out_degree, r.in_degree)
           for r in domain_degrees(links).collect()}
    assert got == {"a.shop.mm": (2, 0), "example.com": (0, 2)}


def test_canonical_url_key_cases(spark):
    """The crawl-identity key: scheme/www/default-port/session noise
    collapses, host reversed for domain-sorted pruning, query params
    sorted — the urlkey convention, JVM-side."""
    from psy_supabase_spark.functions.url import canonical_url_key

    cases = [
        ("http://www.Example.COM/Path?b=2&a=1", "com,example)/path?a=1&b=2"),
        ("https://Example.com:443/x", "com,example)/x"),
        ("http://example.com:80/x", "com,example)/x"),
        ("http://example.com:8080/x", "com,example:8080)/x"),
        ("http://user@host.org", "org,host)/"),
        ("http://h.net/p?utm_source=feed&q=1&sessionid=abc", "net,h)/p?q=1"),
        ("http://h.net/p?UTM_SOURCE=feed", "net,h)/p"),  # lowercased first
        ("http://h.net/p?sessionid=a&fbclid=b", "net,h)/p"),
        ("http://a.b.c/p#frag", "c,b,a)/p"),
        ("not-a-url", "not-a-url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.k for r in df.select(canonical_url_key("url").alias("k")).collect()]
    assert got == [want for _, want in cases]
    plan = (
        df.select(canonical_url_key("url").alias("k"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan


def test_canonical_url_key_duckdb_parity(spark):
    import duckdb

    from psy_supabase_spark.functions.url import (
        canonical_url_key, canonical_url_key_sql,
    )

    urls = [
        "http://www.Example.COM/Path?b=2&a=1&utm_campaign=x",
        "https://Example.com:443/x?z=9",
        "http://example.com:8080/A/B?sid=1",
        "http://user:pw@host.org:80/p?a",
        "http://h.net/p?sessionid=only",
        "http://a.b.c/p#frag",
        "http://a.b.c/p?q=1#frag",
        "plainstring",
        "HTTP://UPPER.NET/Q",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.k for r in df.select(canonical_url_key("url").alias("k")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    want = [r[0] for r in con.execute(
        f"SELECT {canonical_url_key_sql('url')} FROM t"
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
