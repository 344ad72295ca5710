"""URL extraction and domain-blocklist filtering — the C4 / CCNet
source-hygiene stage.

Web-scale corpora drop documents by the DOMAIN their URLs point at
(adult/spam/malware blocklists) before any content-based gate runs.
Everything here is flat per-element array expressions over one regex
extraction — map-side, stream-safe (no state, no shuffle), blocklist
broadcast as a literal array (real blocklists are 10⁴-10⁶ hosts; for
the larger end switch to the broadcast-DataFrame spelling of
:func:`operators.decontam.flag_contaminated`).

Host matching is SUFFIX-aware: ``ads.example.com`` matches a blocklist
entry ``example.com`` (subdomains inherit their parent's verdict —
the standard blocklist semantic), but ``notexample.com`` does not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import URL_RE, ColumnOrName, _c

# host = the authority part: strip scheme and leading www., cut at the
# first /, :, ?, or # — one extraction regex shared by every function
_HOST_RE = r"^(?:https?://)?(?:www\.)?([^/:?#\s]+)"


def extract_urls(col: ColumnOrName) -> Column:
    """All URL-ish substrings (the text-pack ``URL_RE``) as an array."""
    return F.regexp_extract_all(_c(col), F.lit(URL_RE), 1)


def url_hosts(col: ColumnOrName) -> Column:
    """DISTINCT lowercase hosts of every URL in the text (empty matches
    dropped): the per-document domain signature."""
    hosts = F.transform(
        extract_urls(col), lambda u: F.lower(F.regexp_extract(u, _HOST_RE, 1))
    )
    return F.array_distinct(F.filter(hosts, lambda h: h != ""))


def _host_blocked(host: Column, blocked: Column) -> Column:
    return F.exists(
        blocked, lambda b: (host == b) | host.endswith(F.concat(F.lit("."), b))
    )


def is_blocked(col: ColumnOrName, blocklist: list[str]) -> Column:
    """TRUE iff any URL in the text points at a blocklisted domain (or a
    subdomain of one).  Blocklist entries are matched lowercase."""
    blocked = F.array(*[F.lit(b.lower()) for b in blocklist])
    return F.exists(url_hosts(col), lambda h: _host_blocked(h, blocked))


def blocklist_filter(
    docs: DataFrame,
    blocklist: list[str],
    *,
    text_col: str = "text",
    keep_flag: str | None = None,
) -> DataFrame:
    """Drop documents containing blocklisted-domain URLs; with
    ``keep_flag`` return every row with the boolean instead (the audit
    spelling)."""
    flag = is_blocked(text_col, blocklist)
    if keep_flag is not None:
        return docs.withColumn(keep_flag, flag)
    return docs.where(~flag)


# A deliberately-small embedded public-suffix subset (the high-traffic
# head of the Mozilla PSL: generic TLDs fall out of the default rule,
# so only MULTI-LABEL suffixes and popular private registries need
# listing).  Callers at crawl scale pass the full published list via
# `suffixes=` — the expression shape is identical, only the literal
# array grows.  No wildcard/exception rules (the PSL's `*.ck` / `!www.ck`
# corner) — documented subset, like the robots REP subset.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.tw",
    "co.za", "org.za", "co.nz", "org.nz", "govt.nz",
    "com.sg", "com.hk", "com.my", "co.id", "co.th", "in.th",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "cloudfront.net", "web.app",
)


def registrable_domain(
    host: ColumnOrName, *, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> Column:
    """eTLD+1 (the registrable domain) of a host — the grouping key for
    domain-level crawl analytics (`operators/linkgraph` degree rollups,
    per-domain sampling caps): ``news.bbc.co.uk`` → ``bbc.co.uk``,
    ``a.b.example.com`` → ``example.com``, ``user.github.io`` →
    ``user.github.io`` (private registry: each user is a distinct
    publisher).

    PSL algorithm, simplified: the longest listed suffix matching the
    host's tail labels wins and the registrable domain is that suffix
    plus one label; unlisted TLDs use the default single-label rule.
    A host that IS a suffix (or a bare TLD) comes back NULL — it has
    no registrable domain.  Pure codegen: tail-label slices compared
    against per-length literal arrays (one `F.lit(list)` each)."""
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    by_len: dict[int, list[str]] = {}
    for s in suffixes:
        by_len.setdefault(s.count(".") + 1, []).append(s)
    suffix_len = F.lit(1)
    for k in sorted(by_len):  # longest checked last -> wins the chain
        tail_k = F.array_join(
            F.slice(labels, F.greatest(n - F.lit(k) + 1, F.lit(1)), k), "."
        )
        suffix_len = F.when(
            (n >= k)
            & F.array_contains(F.lit(sorted(by_len[k])), tail_k),
            F.lit(k),
        ).otherwise(suffix_len)
    reg_len = suffix_len + 1
    return F.when(
        n >= reg_len,
        F.array_join(
            F.slice(labels, F.greatest(n - reg_len + 1, F.lit(1)), reg_len),
            ".",
        ),
    )


def registrable_domain_sql(
    expr: str, *, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> str:
    """DuckDB mirror of :func:`registrable_domain` (same suffix subset,
    same longest-match chain), for oracle composition."""
    h = f"lower({expr})"
    labels = f"string_split({h}, '.')"
    n = f"len({labels})"
    by_len: dict[int, list[str]] = {}
    for s in suffixes:
        by_len.setdefault(s.count(".") + 1, []).append(s)
    out = "1"
    for k in sorted(by_len):
        lst = "[" + ", ".join(
            "'" + s.replace("'", "''") + "'" for s in sorted(by_len[k])
        ) + "]"
        tail = f"array_to_string({labels}[greatest({n} - {k} + 1, 1):], '.')"
        out = (
            f"CASE WHEN {n} >= {k} AND list_contains({lst}, {tail}) "
            f"THEN {k} ELSE {out} END"
        )
    return (
        f"CASE WHEN {n} >= ({out}) + 1 THEN "
        f"array_to_string({labels}[greatest({n} - (({out}) + 1) + 1, 1):], '.') "
        f"END"
    )
