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
