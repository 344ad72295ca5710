"""robots.txt policy (operators/robots): group parsing, agent
selection, wildcard/anchor matching, longest-match tie-break, DuckDB
mirror parity, codegen-only plans."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from psy_supabase_spark.operators import robots

ROBOTS_A = """# corpus policy
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow:

User-agent: psybot
User-agent: otherbot
Disallow: /p*/x.html$
Allow: /p
Crawl-delay: 3
"""

ROBOTS_B = """User-agent: *
Disallow: /
Allow: /pub
"""


def _rules(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
        "host string, robots_txt string",
    )
    return robots.robots_rules(df)


def test_rules_groups_and_agents(spark):
    rows = _rules(spark).collect()
    by = {(r.host, r.directive, r.path): r for r in rows}
    # group 1 of a.example: the * group, empty Disallow ignored
    r = by[("a.example", "disallow", "/private/")]
    assert r.agents == ["*"] and r.group_id == 1
    # group 2: BOTH consecutive user-agent lines share the group
    r = by[("a.example", "disallow", "/p*/x.html$")]
    assert r.agents == ["otherbot", "psybot"] and r.group_id == 2
    # empty-value rule ignored, crawl-delay not a rule
    assert ("a.example", "disallow", "") not in by
    assert len([k for k in by if k[0] == "a.example"]) == 4


def _requests(spark):
    reqs = [
        ("a.example", "/private/secret"),   # * group: disallow wins
        ("a.example", "/private/ok/page"),  # allow longer than disallow
        ("a.example", "/open"),             # no match -> allowed
        ("c.example", "/anything"),         # no rules at all -> allowed
        ("b.example", "/pub/x"),            # allow /pub beats disallow /
        ("b.example", "/etc"),              # disallow /
    ]
    return spark.createDataFrame(reqs, "host string, path string")


def test_allowed_star_group(spark):
    got = {
        (r.host, r.path): r.allowed
        for r in robots.robots_allowed(
            _rules(spark), _requests(spark), agent="unrelatedbot"
        ).collect()
    }
    assert got == {
        ("a.example", "/private/secret"): False,
        ("a.example", "/private/ok/page"): True,
        ("a.example", "/open"): True,
        ("c.example", "/anything"): True,
        ("b.example", "/pub/x"): True,
        ("b.example", "/etc"): False,
    }


def test_allowed_specific_group_wildcard_anchor(spark):
    reqs = spark.createDataFrame(
        [
            ("a.example", "/p7/x.html"),     # wildcard+anchor disallow (len 12 > 2)
            ("a.example", "/p7/x.html?q"),   # anchor: no match -> allow /p
            ("a.example", "/private/secret"),# * group NOT applicable to psybot
        ],
        "host string, path string",
    )
    got = {
        r.path: r.allowed
        for r in robots.robots_allowed(
            _rules(spark), reqs, agent="PsyBot"
        ).collect()
    }
    assert got == {
        "/p7/x.html": False,
        "/p7/x.html?q": True,
        "/private/secret": True,
    }


def test_longest_match_tie_prefers_allow(spark):
    txt = "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n"
    rules = robots.robots_rules(
        spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    )
    reqs = spark.createDataFrame([("h", "/dir/")], "host string, path string")
    # both rules match /dir/ at rule_len 5 -> tie -> allow
    assert robots.robots_allowed(rules, reqs, agent="x").collect()[0].allowed


def test_duckdb_mirror_parity(spark):
    """robots_rules_sql reproduces the EXACT verdict set for both agent
    regimes over hosts with groups, wildcards, anchors and ties."""
    reqs = [
        ("a.example", "/private/secret"), ("a.example", "/private/ok/page"),
        ("a.example", "/open"), ("a.example", "/p7/x.html"),
        ("a.example", "/p7/x.html?q"), ("b.example", "/pub/x"),
        ("b.example", "/etc"), ("c.example", "/lone"),
    ]
    rdf = spark.createDataFrame(reqs, "host string, path string")
    con = duckdb.connect()
    con.execute("CREATE TABLE robots_src (host VARCHAR, robots_txt VARCHAR)")
    con.executemany(
        "INSERT INTO robots_src VALUES (?, ?)",
        [("a.example", ROBOTS_A), ("b.example", ROBOTS_B)],
    )
    con.execute("CREATE TABLE robots_req (rid INT, host VARCHAR, path VARCHAR)")
    con.executemany(
        "INSERT INTO robots_req VALUES (?, ?, ?)",
        [(i, h, p) for i, (h, p) in enumerate(reqs)],
    )
    for agent in ("psybot", "nobody"):
        got = {
            (r.host, r.path): r.allowed
            for r in robots.robots_allowed(
                _rules(spark), rdf, agent=agent
            ).collect()
        }
        sql = (
            "WITH "
            + robots.robots_rules_sql(agent=agent)
            + "\nSELECT q.host, q.path, v.allowed FROM robots_req q "
            "JOIN rb_verdict v USING (rid)"
        )
        want = {(h, p): a for h, p, a in con.execute(sql).fetchall()}
        assert got == want, agent


ROBOTS_CRLF = "User-agent: *\r\nDisallow: /private\r\nAllow: /private/ok$\r\n"
ROBOTS_EMPTY_GROUP = "User-agent: good\nDisallow:\n\nUser-agent: *\nDisallow: /\n"


def test_crlf_robots_parity(spark):
    """CRLF line endings must not leak \\r into rule paths — and the
    Spark and DuckDB spellings must agree verdict-for-verdict (r11
    ADVICE: '$' matched before the \\r in Spark but RE2 kept it)."""
    src = [("d.example", ROBOTS_CRLF)]
    reqs = [("d.example", "/private/x"), ("d.example", "/private/ok"),
            ("d.example", "/open")]
    rules = robots.robots_rules(
        spark.createDataFrame(src, "host string, robots_txt string")
    )
    assert sorted(
        (r.directive, r.path) for r in rules.collect()
    ) == [("allow", "/private/ok$"), ("disallow", "/private")]
    rdf = spark.createDataFrame(reqs, "host string, path string")
    got = {
        r.path: r.allowed
        for r in robots.robots_allowed(rules, rdf, agent="x").collect()
    }
    assert got == {"/private/x": False, "/private/ok": True, "/open": True}
    con = duckdb.connect()
    con.execute("CREATE TABLE robots_src (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots_src VALUES (?, ?)", src)
    con.execute("CREATE TABLE robots_req (rid INT, host VARCHAR, path VARCHAR)")
    con.executemany(
        "INSERT INTO robots_req VALUES (?, ?, ?)",
        [(i, h, p) for i, (h, p) in enumerate(reqs)],
    )
    sql = (
        "WITH " + robots.robots_rules_sql(agent="x")
        + "\nSELECT q.path, v.allowed FROM robots_req q "
        "JOIN rb_verdict v USING (rid)"
    )
    assert dict(con.execute(sql).fetchall()) == got


def test_empty_value_group_is_allow_all_not_fallback(spark):
    """'User-agent: good / Disallow:' is the standard allow-all
    carve-out: agent `good` HAS a group (all-allow), so the '*' total
    block must NOT apply to it (r11 ADVICE)."""
    src = [("h", ROBOTS_EMPTY_GROUP)]
    rules = robots.robots_rules(
        spark.createDataFrame(src, "host string, robots_txt string")
    )
    reqs = spark.createDataFrame([("h", "/anything")], "host string, path string")
    assert robots.robots_allowed(rules, reqs, agent="good").collect()[0].allowed
    assert not robots.robots_allowed(rules, reqs, agent="evil").collect()[0].allowed
    # DuckDB mirror agrees for both regimes
    con = duckdb.connect()
    con.execute("CREATE TABLE robots_src (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots_src VALUES (?, ?)", src)
    con.execute("CREATE TABLE robots_req (rid INT, host VARCHAR, path VARCHAR)")
    con.execute("INSERT INTO robots_req VALUES (0, 'h', '/anything')")
    for agent, want in (("good", True), ("evil", False)):
        sql = (
            "WITH " + robots.robots_rules_sql(agent=agent)
            + "\nSELECT v.allowed FROM rb_verdict v"
        )
        assert con.execute(sql).fetchone()[0] is want, agent


def test_crawl_delay_group_separation(spark):
    """Groups separated only by allow/disallow lines must not merge:
    b's Crawl-delay cannot attach to a (r11 ADVICE)."""
    txt = "User-agent: a\nDisallow: /x\nUser-agent: b\nCrawl-delay: 5\n"
    df = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    assert robots.robots_crawl_delays(df, agent="a").collect() == []
    got = robots.robots_crawl_delays(df, agent="b").collect()
    assert [(r.host, r.crawl_delay) for r in got] == [("h", 5.0)]


def test_crawl_delay_own_group_without_delay_beats_star(spark):
    """An agent with its OWN group but no Crawl-delay gets NO delay
    (callers default) — not the '*' group's delay."""
    txt = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        "User-agent: psybot\nDisallow: /y\n"
    )
    df = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
    assert robots.robots_crawl_delays(df, agent="psybot").collect() == []
    star = robots.robots_crawl_delays(df, agent="someone").collect()
    assert [(r.host, r.crawl_delay) for r in star] == [("h", 2.0)]


def test_crawl_delays_duckdb_parity(spark):
    """robots_crawl_delays_sql reproduces the exact per-host delay set
    for both agent regimes — group separation, own-group-without-delay,
    CRLF, and unparsable values included."""
    src = [
        ("a.example", ROBOTS_A),                       # psybot group: delay 3
        ("b.example", ROBOTS_B),                       # no delays at all
        ("c.example", "User-agent: a\nDisallow: /x\nUser-agent: b\nCrawl-delay: 5\n"),
        ("d.example", "User-agent: *\r\nCrawl-delay: 2.5\r\nDisallow: /x\r\n"),
        ("e.example", "User-agent: *\nCrawl-delay: fast\n"),  # unparsable
    ]
    df = spark.createDataFrame(src, "host string, robots_txt string")
    con = duckdb.connect()
    con.execute("CREATE TABLE robots_src (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots_src VALUES (?, ?)", src)
    for agent in ("psybot", "a", "b", "nobody"):
        got = sorted(
            (r.host, r.crawl_delay)
            for r in robots.robots_crawl_delays(df, agent=agent).collect()
        )
        sql = (
            "WITH " + robots.robots_crawl_delays_sql(agent=agent)
            + "\nSELECT host, crawl_delay FROM cd_delay"
        )
        want = sorted(con.execute(sql).fetchall())
        assert got == want, agent
    # spot-check semantics, not just parity: nobody gets only the true
    # '*' delays; psybot's own group on a.example beats the void
    star = dict(
        (r.host, r.crawl_delay)
        for r in robots.robots_crawl_delays(df, agent="nobody").collect()
    )
    assert star == {"d.example": 2.5}
    bot = dict(
        (r.host, r.crawl_delay)
        for r in robots.robots_crawl_delays(df, agent="psybot").collect()
    )
    assert bot == {"a.example": 3.0, "d.example": 2.5}


def test_plans_stay_jvm_side(spark):
    rules = _rules(spark)
    out = robots.robots_allowed(rules, _requests(spark), agent="x")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_sitemaps_and_crawl_delays(spark):
    txt = (
        "Sitemap: https://a.example/sm.xml\n"
        "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
        "User-agent: psybot\nCrawl-delay: 0.5\n"
        "Sitemap: https://a.example/sm2.xml\n"
    )
    df = spark.createDataFrame([("a.example", txt)], "host string, robots_txt string")
    sm = sorted(r.sitemap_url for r in robots.robots_sitemaps(df).collect())
    assert sm == ["https://a.example/sm.xml", "https://a.example/sm2.xml"]
    star = robots.robots_crawl_delays(df, agent="someone").collect()
    assert [(r.host, r.crawl_delay) for r in star] == [("a.example", 2.0)]
    bot = robots.robots_crawl_delays(df, agent="PsyBot").collect()
    assert [(r.host, r.crawl_delay) for r in bot] == [("a.example", 0.5)]


def test_parse_sitemap_urlset_and_index(spark):
    urlset = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.example/p?x=1&amp;y=2</loc>"
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><loc> https://a.example/q </loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.example/sm1.xml</loc></sitemap>"
        "<sitemap><loc>https://a.example/sm2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.example", urlset), ("a.example", index)],
        "host string, sitemap_xml string",
    )
    rows = robots.parse_sitemap(df).collect()
    leaves = sorted((r.url, r.lastmod) for r in rows if not r.is_index)
    assert leaves == [
        ("https://a.example/p?x=1&y=2", "2024-01-01"),
        ("https://a.example/q", None),
    ]
    idx = sorted(r.url for r in rows if r.is_index)
    assert idx == ["https://a.example/sm1.xml", "https://a.example/sm2.xml"]
    plan = robots.parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_parse_sitemap_multiline_entries(spark):
    xml = "<urlset>\n<url>\n  <loc>\n    https://a.example/ml\n  </loc>\n</url>\n</urlset>"
    df = spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    assert [r.url for r in robots.parse_sitemap(df).collect()] == [
        "https://a.example/ml"
    ]


def test_sitemap_xml_gz_and_plain(spark):
    """sitemap.xml.gz (magic-sniffed) decodes through the bounded
    member walker; plain XML passes through; the decompressed cap
    holds."""
    import gzip

    xml = "<urlset><url><loc>https://a.example/z</loc></url></urlset>"
    df = spark.createDataFrame(
        [("a", bytearray(gzip.compress(xml.encode()))),
         ("b", bytearray(xml.encode()))],
        "host string, payload binary",
    )
    out = robots.sitemap_xml(df)
    got = {r.host: r.sitemap_xml for r in out.collect()}
    assert got == {"a": xml, "b": xml}
    # bomb guard: a 1 MB expansion capped at 64 bytes stays 64 bytes
    big = gzip.compress(b"x" * (1 << 20))
    df2 = spark.createDataFrame(
        [("c", bytearray(big))], "host string, payload binary"
    )
    capped = robots.sitemap_xml(df2, max_bytes=64).collect()[0].sitemap_xml
    assert len(capped) == 64
    # end-to-end: gz urlset -> parse_sitemap leaves
    rows = robots.parse_sitemap(robots.sitemap_xml(df)).collect()
    assert sorted(r.url for r in rows) == ["https://a.example/z"] * 2


def test_resolve_sitemap_index_one_hop(spark):
    """index -> leaf resolution through a caller-injected fetch, depth
    bounded (a self-referencing index cannot loop)."""
    index = (
        "<sitemapindex><sitemap><loc>https://a.example/sm1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    leaf = (
        "<urlset><url><loc>https://a.example/p1</loc>"
        "<lastmod>2024-02-02</lastmod></url>"
        "<url><loc>https://a.example/p2</loc></url></urlset>"
    )
    direct = "<urlset><url><loc>https://a.example/p0</loc></url></urlset>"
    df = spark.createDataFrame(
        [("a.example", index), ("a.example", direct)],
        "host string, sitemap_xml string",
    )
    fetched = {"https://a.example/sm1.xml": leaf}

    def fetch(targets):
        rows = [(r.host, fetched.get(r.url, index)) for r in targets.collect()]
        return spark.createDataFrame(rows, "host string, sitemap_xml string")

    got = sorted(
        (r.url, r.lastmod)
        for r in robots.resolve_sitemap_index(df, fetch).collect()
    )
    assert got == [
        ("https://a.example/p0", None),
        ("https://a.example/p1", "2024-02-02"),
        ("https://a.example/p2", None),
    ]
    # cycle guard: an index that always returns itself terminates with
    # only the direct leaves
    def fetch_cycle(targets):
        rows = [(r.host, index) for r in targets.collect()]
        return spark.createDataFrame(rows, "host string, sitemap_xml string")

    got2 = [r.url for r in robots.resolve_sitemap_index(df, fetch_cycle).collect()]
    assert got2 == ["https://a.example/p0"]


def test_schedule_frontier_politeness(spark):
    urls = spark.createDataFrame(
        [("a", f"http://a/{i}") for i in range(4)]
        + [("b", "http://b/0"), ("c", "http://c/0")],
        "host string, url string",
    )
    delays = spark.createDataFrame(
        [("a", 2.0), ("b", 0.5)], "host string, crawl_delay double"
    )
    rows = robots.schedule_frontier(urls, delays, max_per_host=3).collect()
    by = {(r.host, r.fetch_slot): r.fetch_offset_sec for r in rows}
    # host a: slots 0..2 at 2s spacing; slot 3 truncated by max_per_host
    assert by[("a", 0)] == 0.0 and by[("a", 1)] == 2.0 and by[("a", 2)] == 4.0
    assert ("a", 3) not in by
    assert by[("b", 0)] == 0.0
    # host c published no delay -> default applies on later slots; one
    # url means slot 0 / offset 0 either way, and the row survives
    assert by[("c", 0)] == 0.0
    assert len(rows) == 5


def test_schedule_frontier_url_col(spark):
    """A frame whose URL column is not named 'url' schedules by the
    named column (r11 ADVICE: orderBy was hardcoded)."""
    urls = spark.createDataFrame(
        [("a", "http://a/2"), ("a", "http://a/1")], "host string, link string"
    )
    delays = spark.createDataFrame([], "host string, crawl_delay double")
    rows = robots.schedule_frontier(urls, delays, url_col="link").collect()
    by = {r.link: r.fetch_slot for r in rows}
    assert by == {"http://a/1": 0, "http://a/2": 1}


def test_precap_bounds_monster_host(spark):
    """A 10^6-URL host with max_per_host=100: the window input is
    bounded by the pre-cap (expected 800 = 100*8 slack), and the final
    schedule still has exactly 100 slots; hosts under the threshold are
    scheduled exactly as without the cap."""
    from pyspark.sql import functions as F

    big = spark.range(1_000_000).select(
        F.lit("big").alias("host"),
        F.concat(F.lit("http://big/"), F.col("id")).alias("url"),
    )
    small = spark.createDataFrame(
        [("small", f"http://small/{i}") for i in range(5)],
        "host string, url string",
    )
    urls = big.union(small)
    capped = robots.precap_frontier(urls, cap=800)
    n_big = capped.where(F.col("host") == "big").count()
    # binomial around 800: generous 3x band, far below the 10^6 depth
    assert 400 <= n_big <= 1600
    assert capped.where(F.col("host") == "small").count() == 5
    # NULL hosts are one group like any other: preserved (null-safe
    # count join) and bounded, never silently dropped
    with_null = small.union(
        spark.createDataFrame(
            [(None, "garbage-url"), (None, "garbage-url-2")],
            "host string, url string",
        )
    )
    kept = robots.precap_frontier(with_null, cap=800)
    assert kept.where(F.col("host").isNull()).count() == 2
    assert kept.count() == 7
    delays = spark.createDataFrame([("big", 0.5)], "host string, crawl_delay double")
    sched = robots.schedule_frontier(urls, delays, max_per_host=100)
    agg = {
        r.host: (r.n, r.mx)
        for r in sched.groupBy("host")
        .agg(F.count("*").alias("n"), F.max("fetch_slot").alias("mx"))
        .collect()
    }
    assert agg["big"] == (100, 99)
    assert agg["small"] == (5, 4)


def test_delay_only_group_not_merged_into_star(spark):
    """Two user-agent runs separated ONLY by a Crawl-delay line are
    distinct groups (r12 ADVICE): agent `a` owns a delay-only
    (allow-everything) group, so the `*` total block must NOT apply to
    it — and the DuckDB spelling must agree for both regimes."""
    src = [("h", "User-agent: a\nCrawl-delay: 5\n\nUser-agent: *\nDisallow: /\n")]
    rules = robots.robots_rules(
        spark.createDataFrame(src, "host string, robots_txt string")
    )
    # two groups parsed: a's marker row (null directive) + *'s block
    by_gid = {
        r.group_id: (r.agents, r.directive)
        for r in rules.collect()
    }
    assert by_gid == {1: (["a"], None), 2: (["*"], "disallow")}
    reqs = spark.createDataFrame([("h", "/x")], "host string, path string")
    assert robots.robots_allowed(rules, reqs, agent="a").collect()[0].allowed
    assert not robots.robots_allowed(rules, reqs, agent="z").collect()[0].allowed
    # the delay still attaches to a, not to the * group (the two
    # parsers derive the SAME groups from one file now)
    df = spark.createDataFrame(src, "host string, robots_txt string")
    assert [
        (r.host, r.crawl_delay)
        for r in robots.robots_crawl_delays(df, agent="a").collect()
    ] == [("h", 5.0)]
    assert robots.robots_crawl_delays(df, agent="z").collect() == []
    con = duckdb.connect()
    con.execute("CREATE TABLE robots_src (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots_src VALUES (?, ?)", src)
    con.execute("CREATE TABLE robots_req (rid INT, host VARCHAR, path VARCHAR)")
    con.execute("INSERT INTO robots_req VALUES (0, 'h', '/x')")
    for agent, want in (("a", True), ("z", False)):
        sql = (
            "WITH " + robots.robots_rules_sql(agent=agent)
            + "\nSELECT v.allowed FROM rb_verdict v"
        )
        assert con.execute(sql).fetchone()[0] is want, agent


def test_resolve_sitemap_index_nothing_persisted(spark, tmp_path):
    """The per-level spill leaves NOTHING cached after the call returns
    (r12 verdict: the old per-level persists accumulated in executor
    storage for the session's lifetime), and each fetch leg executes
    exactly once even when the leaves are materialized repeatedly."""
    index = (
        "<sitemapindex><sitemap><loc>https://a.example/sm1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    leaf = "<urlset><url><loc>https://a.example/p1</loc></url></urlset>"
    df = spark.createDataFrame(
        [("a.example", index)], "host string, sitemap_xml string"
    )
    calls = {"n": 0}

    def fetch(targets):
        calls["n"] += targets.count()
        rows = [(r.host, leaf) for r in targets.collect()]
        return spark.createDataFrame(rows, "host string, sitemap_xml string")

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    out = robots.resolve_sitemap_index(
        df, fetch, scratch_dir=str(tmp_path / "lvl")
    )
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    assert after - before == set()
    # the fetch leg ran once (during the spill write), and re-collecting
    # the leaves does not re-fire it
    assert [r.url for r in out.collect()] == ["https://a.example/p1"]
    assert [r.url for r in out.collect()] == ["https://a.example/p1"]
    assert calls["n"] == 1
    # the level spills are GONE after the call (r13 verdict: they
    # accumulated across calls in a long session); only the one small
    # materialized leaves dir remains until the caller deletes scratch
    import os

    scratch = tmp_path / "lvl"
    assert sorted(
        d for d in os.listdir(scratch) if not d.startswith(".")
    ) == ["leaves"]
