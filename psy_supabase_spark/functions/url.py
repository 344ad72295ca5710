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
# so only MULTI-LABEL suffixes, wildcard/exception ccTLDs, and popular
# private registries need listing).  Callers at crawl scale pass the
# full published list via `suffixes=` (see
# :func:`load_public_suffix_list`) — the expression shape is identical,
# only the literal arrays grow.  Full PSL rule semantics (r12):
# wildcard rules (`*.ck` — any single label under ck is itself a
# public suffix) and exception rules (`!www.ck` — www.ck is
# registrable despite the wildcard) follow the published algorithm.
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
    # the published PSL's wildcard ccTLDs + their exceptions
    "*.bd", "*.ck", "!www.ck", "*.er", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg",
)


def _idna_ascii(rule: str) -> str | None:
    """Wire-format (punycode) twin of a Unicode PSL rule, or None when
    the rule is pure ASCII / un-encodable.  Uses the stdlib ``idna``
    codec (IDNA 2003; the PSL publishes UTS-46/IDNA-2008 — the label
    classes where the two differ are rare and fall back to the
    Unicode-only rule)."""
    if rule.isascii():
        return None
    prefix, body = ("!", rule[1:]) if rule.startswith("!") else ("", rule)
    out: list[str] = []
    for lab in body.split("."):
        if lab in ("*", "") or lab.isascii():
            out.append(lab)
            continue
        try:
            out.append(lab.encode("idna").decode("ascii"))
        except UnicodeError:
            return None
    return prefix + ".".join(out)


def load_public_suffix_list(text: str) -> tuple[str, ...]:
    """Parse the published Public Suffix List file format
    (https://publicsuffix.org/list/): one rule per line, ``//``
    comments and blank lines skipped, each line read up to the first
    whitespace, lowercased.  Section markers (``===BEGIN ICANN
    DOMAINS===`` etc.) are comments.  The result feeds
    :func:`registrable_domain` / :func:`registrable_domain_sql` via
    ``suffixes=`` — wildcard (``*.``) and exception (``!``) rules ride
    through verbatim.

    Unicode (IDN) rules are kept AND twinned with their punycode wire
    form (``中国`` → ``xn--fiqs8s``): crawled hostnames arrive
    ASCII-punycode, so without the twin every IDN suffix would
    silently fall to the default single-label rule."""
    rules: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        rules.append(rule)
        twin = _idna_ascii(rule)
        if twin is not None:
            rules.append(twin)
    return tuple(rules)


def _psl_buckets(
    suffixes: tuple[str, ...],
) -> tuple[dict[int, list[str]], dict[int, list[str]], dict[int, list[str]]]:
    """Partition PSL rules by kind and label count: literals keyed by
    their label count, wildcards keyed by the FULL rule label count
    (``*.ck`` → 2) carrying the tail after ``*.``, exceptions keyed by
    their label count carrying the bare labels."""
    lit: dict[int, list[str]] = {}
    wild: dict[int, list[str]] = {}
    exc: dict[int, list[str]] = {}
    for s in suffixes:
        s = s.lower()
        if s.startswith("!"):
            body = s[1:]
            exc.setdefault(body.count(".") + 1, []).append(body)
        elif s.startswith("*."):
            tail = s[2:]
            wild.setdefault(tail.count(".") + 2, []).append(tail)
        else:
            lit.setdefault(s.count(".") + 1, []).append(s)
    return lit, wild, exc


# Query parameters that never change the fetched content — tracking
# beacons and session tokens (the Common Crawl / wayback urlkey
# convention): stripped before the canonical key so the same page under
# a million session ids collapses to ONE frontier/dedup identity.
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "jsessionid", "phpsessid", "sessionid",
    "sid",
)


def canonical_url_key(
    col: ColumnOrName, *, strip_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """SURT-style canonical url key, JVM-side — the frontier/dedup
    identity at crawl scale (``sources.cdx.surt_key`` is the
    driver-side twin used inside the index builder's Arrow leg; this
    expression is the one to dedup billions of URLs with, map-side,
    no Python):

    - scheme dropped; host lowercased, ``www.`` stripped, userinfo
      stripped, default port (:80 http / :443 https) stripped, other
      ports kept;
    - host labels REVERSED and comma-joined (``com,example)`` — keys
      sort by registered domain, which is what index pruning and
      per-domain sampling need);
    - path lowercased (empty → ``/``); fragment dropped (parse_url
      never returns it in PATH/QUERY);
    - query lowercased, split on ``&``, tracking/session params
      (``strip_params``, matched on the name before ``=``) and empty
      pairs dropped, remainder SORTED and rejoined — param order and
      session noise never split a dedup group.

    Non-URL input (no scheme) falls back to the lowercased raw string,
    like ``surt_key``.  DuckDB mirror: :func:`canonical_url_key_sql`."""
    u = _c(col)
    proto = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    auth = F.lower(F.coalesce(F.parse_url(u, F.lit("AUTHORITY")), F.lit("")))
    hostport = F.element_at(F.split(auth, "@"), -1)
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        proto == "http", F.regexp_replace(hostport, ":80$", "")
    ).when(
        proto == "https", F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    hostname = F.regexp_replace(hostport, r":\d+$", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    path = F.lower(F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.lower(F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")))
    dropped = F.array(*[F.lit(p.lower()) for p in strip_params])
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~F.array_contains(dropped, F.element_at(F.split(p, "="), 1)),
    )
    qs = F.array_join(F.sort_array(parts), "&")
    key = F.concat(
        rev,
        port,
        F.lit(")"),
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(
        F.parse_url(u, F.lit("HOST")).isNotNull(), key
    ).otherwise(F.lower(u))


def canonical_url_key_sql(
    expr: str, *, strip_params: tuple[str, ...] = TRACKING_PARAMS
) -> str:
    """DuckDB mirror of :func:`canonical_url_key` (regex splits instead
    of parse_url — exact on well-formed absolute http(s) URLs, which is
    the domain the gated grammar feeds both engines)."""
    drop = "[" + ", ".join(
        "'" + p.lower().replace("'", "''") + "'" for p in strip_params
    ) + "]"
    proto = f"lower(regexp_extract({expr}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    auth = f"lower(regexp_extract({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1))"
    hostport = f"string_split({auth}, '@')[-1]"
    hostport = f"regexp_replace({hostport}, '^www\\.', '')"
    hostport = (
        f"CASE WHEN {proto} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"WHEN {proto} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"ELSE {hostport} END"
    )
    hostname = f"regexp_replace({hostport}, ':[0-9]+$', '')"
    port = f"regexp_extract({hostport}, '(:[0-9]+)$', 1)"
    rev = f"array_to_string(list_reverse(string_split({hostname}, '.')), ',')"
    rawpath = f"lower(regexp_extract({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1))"
    path = f"CASE WHEN {rawpath} = '' THEN '/' ELSE {rawpath} END"
    q = f"lower(regexp_extract({expr}, '\\?([^#]*)', 1))"
    parts = (
        f"list_filter(string_split({q}, '&'), "
        f"p -> p <> '' AND NOT list_contains({drop}, string_split(p, '=')[1]))"
    )
    qs = f"array_to_string(list_sort({parts}), '&')"
    key = (
        f"({rev} || {port} || ')' || {path} || "
        f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END)"
    )
    return (
        f"CASE WHEN {auth} <> '' THEN {key} ELSE lower({expr}) END"
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

    Full PSL algorithm (publicsuffix.org/list/): the matching rule
    with the most labels wins — a literal rule matches the host's tail
    labels exactly; a wildcard rule (``*.ck``) matches any single
    label in the ``*`` position; an exception rule (``!www.ck``)
    overrides every other match and its public suffix is the rule
    minus the leftmost label.  No rule matching → the default
    single-label rule.  The registrable domain is the public suffix
    plus one label; a host that IS a public suffix comes back NULL.
    Pure codegen: tail-label slices compared against per-length
    literal arrays (one `F.lit(list)` each; a wildcard is one extra
    label-count branch, an exception one trailing override)."""
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    lit, wild, exc = _psl_buckets(suffixes)

    def tail(k: int) -> Column:
        return F.array_join(
            F.slice(labels, F.greatest(n - F.lit(k) + 1, F.lit(1)), k), "."
        )

    suffix_len = F.lit(1)
    for k in sorted(set(lit) | set(wild)):  # longest last -> wins
        cond = F.lit(False)
        if k in lit:
            cond = cond | F.array_contains(F.lit(sorted(lit[k])), tail(k))
        if k in wild:
            # `*` consumes exactly one label: the k-1 tail labels must
            # equal the rule tail AND a label must exist in * position
            cond = cond | F.array_contains(
                F.lit(sorted(wild[k])), tail(k - 1)
            )
        suffix_len = F.when((n >= k) & cond, F.lit(k)).otherwise(suffix_len)
    for j in sorted(exc):  # exceptions beat every other rule
        suffix_len = F.when(
            (n >= j) & F.array_contains(F.lit(sorted(exc[j])), tail(j)),
            F.lit(j - 1),
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
    """DuckDB mirror of :func:`registrable_domain` (same rule set,
    same longest-match chain, same wildcard/exception branches), for
    oracle composition."""
    h = f"lower({expr})"
    labels = f"string_split({h}, '.')"
    n = f"len({labels})"
    lit, wild, exc = _psl_buckets(suffixes)

    def sql_list(items: list[str]) -> str:
        return "[" + ", ".join(
            "'" + s.replace("'", "''") + "'" for s in sorted(items)
        ) + "]"

    def tail(k: int) -> str:
        return f"array_to_string({labels}[greatest({n} - {k} + 1, 1):], '.')"

    out = "1"
    for k in sorted(set(lit) | set(wild)):
        conds = []
        if k in lit:
            conds.append(f"list_contains({sql_list(lit[k])}, {tail(k)})")
        if k in wild:
            conds.append(
                f"list_contains({sql_list(wild[k])}, {tail(k - 1)})"
            )
        out = (
            f"CASE WHEN {n} >= {k} AND ({' OR '.join(conds)}) "
            f"THEN {k} ELSE {out} END"
        )
    for j in sorted(exc):
        out = (
            f"CASE WHEN {n} >= {j} AND list_contains({sql_list(exc[j])}, "
            f"{tail(j)}) THEN {j - 1} ELSE {out} END"
        )
    return (
        f"CASE WHEN {n} >= ({out}) + 1 THEN "
        f"array_to_string({labels}[greatest({n} - (({out}) + 1) + 1, 1):], '.') "
        f"END"
    )
