"""robots.txt directive parsing + fetch-policy decisions — the
crawl-politeness leg of the Common Crawl family.

Every crawl snapshot ships the robots.txt captures it honored
(Common Crawl publishes them as a separate WARC subset); the two
analytics a pipeline runs on them are (a) corpus-level directive
statistics (who blocks whom, how much of a host is fenced off) and
(b) frontier filtering — "may agent A fetch URL U under host H's
policy?" for billions of (A, U) pairs.

Both are DECLARATIVE here — line explode + window-sum group
assignment + LIKE-translated wildcard match + longest-match window —
zero Python in any decision path, so the decision runs map-side-ish
at frontier scale and the whole grammar is DuckDB-mirrorable
(:func:`robots_rules_sql`) and therefore driver-oracle-gateable.
(The ONE Arrow leg in this module is :func:`sitemap_xml`'s gzip
decode — I/O-adjacent byte work, the WARC-decode shape, never on the
per-request path.)

Implemented semantics (the documented, deliberately-pinned subset of
REP / RFC 9309 + the Google spec):

- groups = maximal runs of consecutive ``User-agent`` lines followed
  by their rules; comments (``#…``) and blank lines stripped; rules
  before any User-agent line are ignored (per the RFC);
- agent matching is exact, case-insensitive token equality, with
  ``*`` as the fallback group; a host with ANY group naming the agent
  uses ONLY those groups (the RFC's "most specific group" rule at
  token granularity — no prefix matching of product tokens);
- rule paths match as prefixes with ``*`` wildcards and a trailing
  ``$`` end-anchor (translated to SQL LIKE with escaping);
- decision = longest matching rule wins (length of the raw rule text,
  the Google tie-breaker), ties prefer Allow; no matching rule or no
  applicable group → allowed;
- empty-value rules (``Disallow:``) are ignored (equivalent to
  allow-everything per the RFC) — but the GROUP still exists for the
  most-specific-group rule: ``User-agent: good\nDisallow:`` means
  agent ``good`` is allowed everywhere, NOT that it falls back to the
  ``*`` group (r11 ADVICE);
- lines split on ``\r?\n`` so CRLF robots.txt (the dominant wire
  format) parses identically in both engines (r11 ADVICE).
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"^([A-Za-z-]+)\s*:"
_VALUE_RE = r"^[A-Za-z-]+\s*:\s*(.*)$"


def _like_pattern(path: Column) -> Column:
    """robots path (with ``*`` wildcards) → LIKE body: escape the LIKE
    metacharacters, then ``*`` → ``%``.  The trailing ``$`` anchor is
    handled by the caller (it decides whether to append the ``%``)."""
    p = F.regexp_replace(path, r"\$$", "")
    p = F.replace(p, F.lit("\\"), F.lit("\\\\"))
    p = F.replace(p, F.lit("%"), F.lit("\\%"))
    p = F.replace(p, F.lit("_"), F.lit("\\_"))
    return F.replace(p, F.lit("*"), F.lit("%"))


def robots_rules(
    df: DataFrame, *, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots.txt text) → one row per rule:
    (host, group_id, agents array<string>, directive, path, rule_len).

    Pure expressions + two windows: comment-strip / directive split are
    regexes, group ids are a window running-sum over "first User-agent
    line of a run" flags, agents attach by (host, group) join.  The
    rule's group carries a SORTED agent array so downstream output is
    deterministic under any partitioning.

    Group ids are computed over the SAME four-directive line set
    :func:`robots_crawl_delays` uses (user-agent + allow/disallow +
    crawl-delay) BEFORE filtering to rule lines: two user-agent runs
    separated only by a Crawl-delay line are DISTINCT groups — e.g.
    ``User-agent: a⏎Crawl-delay: 5⏎⏎User-agent: *⏎Disallow: /`` gives
    agent ``a`` its own (delay-only, allow-everything) group, it does
    NOT merge ``a`` into the ``*`` block (r12 ADVICE: the two parsers
    previously derived contradictory groups from one file).

    A group whose only rules are empty-value (``Disallow:``) still
    emits ONE row with null directive/path/rule_len — the group's
    EXISTENCE drives :func:`robots_allowed`'s most-specific-group
    selection even though it contributes no matchable rule (r11
    ADVICE: deriving group existence from surviving rules turned the
    standard allow-all carve-out into a total block)."""
    lines = (
        df.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias(
                "pos", "raw"
            ),
        )
        .select(
            "host",
            "pos",
            F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
        )
        .select(
            "host",
            "pos",
            F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias(
                "directive"
            ),
            F.trim(F.regexp_extract("line", _VALUE_RE, 1)).alias("value"),
        )
        .where(
            F.col("directive").isin(
                "user-agent", "allow", "disallow", "crawl-delay"
            )
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = lines.withColumn(
        "group_id",
        F.sum(
            (
                (F.col("directive") == "user-agent")
                & (
                    F.coalesce(F.lag("directive").over(w), F.lit(""))
                    != "user-agent"
                )
            ).cast("int")
        ).over(w),
    )
    agents = (
        grouped.where(F.col("directive") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.sort_array(F.collect_set(F.lower("value"))).alias("agents"))
    )
    rules = grouped.where(
        F.col("directive").isin("allow", "disallow") & (F.col("value") != "")
    ).select(
        "host",
        "group_id",
        "directive",
        F.col("value").alias("path"),
        F.length("value").alias("rule_len"),
    )
    # agents LEFT JOIN rules: rule-less groups survive as marker rows
    return agents.join(rules, ["host", "group_id"], "left").select(
        "host", "group_id", "agents", "directive", "path", "rule_len"
    )


def robots_allowed(
    rules: DataFrame,
    requests: DataFrame,
    *,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """requests (host, path, …) → same rows + ``allowed`` boolean under
    ``agent``.  The applicable group set per host is the agent's own
    groups when any exist, else the ``*`` groups (the RFC most-specific
    rule); the verdict is the longest matching rule's directive, ties
    preferring Allow; no rule → allowed.

    Shuffle shape at frontier scale: the rules side is one row per
    (host, rule) — millions, not billions — and broadcast-joins to the
    request stream on ``host``; the longest-match winner is a per-request
    window over only the MATCHED rules (typically a handful)."""
    a = F.lit(agent.lower())
    # group EXISTENCE (incl. rule-less marker rows), not surviving rules,
    # decides whether the agent has its own groups (r11 ADVICE)
    per_host = rules.groupBy("host").agg(
        F.max(F.array_contains("agents", a).cast("int")).alias("_has_agent")
    )
    applicable = (
        rules.join(per_host, "host")
        .where(
            F.col("directive").isNotNull()
            & (
                (F.array_contains("agents", a) & (F.col("_has_agent") == 1))
                | (F.array_contains("agents", "*") & (F.col("_has_agent") == 0))
            )
        )
        .select(
            F.col("host").alias("_rhost"),
            F.col("directive").alias("_rdir"),
            "rule_len",
            _like_pattern(F.col("path")).alias("_body"),
            F.col("path").endswith("$").alias("_anchored"),
        )
    )
    # ONE linear lineage, no back-join: _rid is minted once and flows
    # through a single left join + groupBy (the operators/asof pattern
    # — monotonically_increasing_id re-evaluated on two branches of a
    # self-join is retry-UNSTABLE: a recomputed branch can assign
    # different ids and mispair the join).  The full request row rides
    # as a struct; _rid only keeps fully-duplicate rows distinct.
    l = requests.select(
        F.monotonically_increasing_id().alias("_rid"),
        F.col(host_col).alias("_qhost"),
        F.col(path_col).alias("_qpath"),
        F.struct(*requests.columns).alias("_row"),
    )
    cand = l.join(applicable, l["_qhost"] == applicable["_rhost"], "left")
    match_ok = F.col("_rhost").isNotNull() & F.when(
        F.col("_anchored"), F.like(F.col("_qpath"), F.col("_body"))
    ).otherwise(F.like(F.col("_qpath"), F.concat(F.col("_body"), F.lit("%"))))
    # winner = max (rule_len, allow?) struct: lexicographic max IS the
    # longest-match rule with ties preferring Allow; max ignores the
    # non-matching (null) candidates, an all-null group -> NULL -> the
    # RFC allowed-by-default posture
    win = F.max(
        F.when(
            match_ok,
            F.struct(
                F.col("rule_len"),
                (F.col("_rdir") == "allow").cast("int").alias("a"),
            ),
        )
    ).alias("_w")
    decided = cand.groupBy("_rid", "_row").agg(win)
    return decided.select(
        F.col("_row.*"),
        F.coalesce(F.col("_w.a") == 1, F.lit(True)).alias("allowed"),
    )


def robots_rules_sql(
    *,
    robots_cte: str = "robots_src",
    agent: str,
    requests_cte: str = "robots_req",
    prefix: str = "rb",
) -> str:
    """DuckDB CTE block mirroring robots_rules + robots_allowed
    term-for-term (the pagerank_sql pattern).  Expects in-scope CTEs
    ``robots_cte`` (host, robots_txt) and ``requests_cte`` (rid, host,
    path); emits CTE ``{prefix}_verdict`` of (rid, allowed).  ``prefix``
    namespaces the internal CTEs so one oracle can instantiate the
    tower for several agents."""
    a = agent.lower().replace("'", "''")
    p = prefix
    return f"""{p}_lines AS (
      SELECT host, pos,
             lower(regexp_extract(l, '{_DIRECTIVE_RE}', 1)) AS directive,
             trim(regexp_extract(l, '{_VALUE_RE}', 1)) AS value
      FROM (
        SELECT host, u.pos AS pos,
               trim(regexp_replace(
                 regexp_split_to_array(robots_txt, '\\r?\\n')[u.pos],
                 '#.*$', ''
               )) AS l
        FROM {robots_cte},
             unnest(range(1,
               len(regexp_split_to_array(robots_txt, '\\r?\\n')) + 1))
               AS u(pos)
      )
      -- group ids run over the SAME four-directive line set the Spark
      -- spelling (and robots_crawl_delays) uses: a delay-only group
      -- must not merge into the next user-agent run (r12 ADVICE)
      WHERE lower(regexp_extract(l, '{_DIRECTIVE_RE}', 1))
            IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
    ),
    {p}_flagged AS (
      SELECT *, CASE WHEN directive = 'user-agent'
                      AND COALESCE(LAG(directive) OVER
                            (PARTITION BY host ORDER BY pos), '')
                          <> 'user-agent'
                     THEN 1 ELSE 0 END AS is_start
      FROM {p}_lines
    ),
    {p}_grouped AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY host ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS group_id
      FROM {p}_flagged
    ),
    {p}_agents AS (
      SELECT host, group_id,
             list_sort(list(DISTINCT lower(value))) AS agents
      FROM {p}_grouped WHERE directive = 'user-agent'
      GROUP BY host, group_id
    ),
    {p}_rules AS (
      -- agents LEFT JOIN rule rows: rule-less groups survive as marker
      -- rows (null directive) so group EXISTENCE drives has_agent
      SELECT a.host, a.group_id, g.directive, g.value AS path,
             length(g.value) AS rule_len, a.agents
      FROM {p}_agents a LEFT JOIN (
        SELECT host, group_id, directive, value FROM {p}_grouped
        WHERE directive IN ('allow', 'disallow') AND value <> ''
      ) g ON g.host = a.host AND g.group_id = a.group_id
    ),
    {p}_hasagent AS (
      SELECT host, MAX(CASE WHEN list_contains(agents, '{a}')
                            THEN 1 ELSE 0 END) AS has_agent
      FROM {p}_rules GROUP BY host
    ),
    {p}_applicable AS (
      SELECT r.host, r.directive, r.path, r.rule_len,
             replace(replace(replace(replace(
               regexp_replace(r.path, '\\$$', ''),
               '\\', '\\\\'), '%', '\\%'), '_', '\\_'), '*', '%') AS body,
             r.path LIKE '%$' AS anchored
      FROM {p}_rules r JOIN {p}_hasagent h ON h.host = r.host
      WHERE r.directive IS NOT NULL
        AND ((list_contains(r.agents, '{a}') AND h.has_agent = 1)
          OR (list_contains(r.agents, '*') AND h.has_agent = 0))
    ),
    {p}_matched AS (
      SELECT q.rid, a.directive, a.rule_len
      FROM {requests_cte} q LEFT JOIN {p}_applicable a
        ON a.host = q.host
       AND CASE WHEN a.anchored
                THEN q.path LIKE a.body ESCAPE '\\'
                ELSE q.path LIKE (a.body || '%') ESCAPE '\\' END
    ),
    {p}_ranked AS (
      SELECT rid, directive,
             ROW_NUMBER() OVER (PARTITION BY rid
                                ORDER BY rule_len DESC, directive ASC) AS rn
      FROM {p}_matched
    ),
    {p}_verdict AS (
      SELECT rid, COALESCE(directive = 'allow', TRUE) AS allowed
      FROM {p}_ranked WHERE rn = 1
    )"""


def robots_sitemaps(
    df: DataFrame, *, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) — ``Sitemap:`` lines are group-independent
    per the spec, so this is a straight line-explode + regex filter
    (the seed list a crawler feeds its frontier before any fetch)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), r"\r?\n")).alias("raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    return lines.where(
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)) == "sitemap"
    ).select(
        "host",
        F.trim(F.regexp_extract("line", _VALUE_RE, 1)).alias("sitemap_url"),
    ).where(F.col("sitemap_url") != "")


def robots_crawl_delays(
    rules_src: DataFrame,
    *,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, crawl_delay double) for the agent's applicable group —
    the politeness interval a frontier scheduler rate-limits each host
    by.  Group selection follows :func:`robots_allowed` (agent's own
    groups beat ``*``, and the agent having ANY group — even one with
    no Crawl-delay — means the ``*`` delay does NOT apply to it);
    unparsable or absent delays drop out (callers apply their own
    default).

    Group ids are computed over the SAME line set :func:`robots_rules`
    uses (user-agent + allow/disallow + crawl-delay): two groups
    separated only by allow/disallow lines must NOT merge, or a later
    group's Crawl-delay attaches to earlier agents (r11 ADVICE)."""
    df = rules_src
    line = F.trim(F.regexp_replace("raw", "#.*$", ""))
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "raw"),
    ).select(
        "host", "pos",
        F.lower(F.regexp_extract(line, _DIRECTIVE_RE, 1)).alias("directive"),
        F.trim(F.regexp_extract(line, _VALUE_RE, 1)).alias("value"),
    ).where(
        F.col("directive").isin(
            "user-agent", "allow", "disallow", "crawl-delay"
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = lines.withColumn(
        "group_id",
        F.sum(
            (
                (F.col("directive") == "user-agent")
                & (
                    F.coalesce(F.lag("directive").over(w), F.lit(""))
                    != "user-agent"
                )
            ).cast("int")
        ).over(w),
    )
    agents = (
        grouped.where(F.col("directive") == "user-agent")
        .groupBy("host", "group_id")
        .agg(F.sort_array(F.collect_set(F.lower("value"))).alias("agents"))
    )
    a = F.lit(agent.lower())
    # group EXISTENCE (all groups, delay or not) decides the regime
    per_host = agents.groupBy("host").agg(
        F.max(F.array_contains("agents", a).cast("int")).alias("_has_agent")
    )
    delays = (
        grouped.where(F.col("directive") == "crawl-delay")
        .select(
            "host", "group_id",
            # try_cast: unparsable delays drop, never raise (ANSI-safe)
            F.col("value").try_cast("double").alias("crawl_delay"),
        )
        .where(F.col("crawl_delay").isNotNull())
        .join(agents, ["host", "group_id"])
    )
    return (
        delays.join(per_host, "host")
        .where(
            (F.array_contains("agents", a) & (F.col("_has_agent") == 1))
            | (F.array_contains("agents", "*") & (F.col("_has_agent") == 0))
        )
        .groupBy("host")
        .agg(F.min("crawl_delay").alias("crawl_delay"))
    )


def robots_crawl_delays_sql(
    *,
    robots_cte: str = "robots_src",
    agent: str,
    prefix: str = "cd",
) -> str:
    """DuckDB CTE block mirroring :func:`robots_crawl_delays`
    term-for-term (the robots_rules_sql pattern).  Expects an in-scope
    CTE ``robots_cte`` (host, robots_txt); emits CTE
    ``{prefix}_delay`` of (host, crawl_delay).  Group ids run over the
    same four-directive line set as the Spark side (user-agent +
    allow/disallow + crawl-delay) so allow/disallow lines keep groups
    apart; agent-group existence comes from the agents table, not from
    surviving delays."""
    a = agent.lower().replace("'", "''")
    p = prefix
    return f"""{p}_lines AS (
      SELECT host, pos,
             lower(regexp_extract(l, '{_DIRECTIVE_RE}', 1)) AS directive,
             trim(regexp_extract(l, '{_VALUE_RE}', 1)) AS value
      FROM (
        SELECT host, u.pos AS pos,
               trim(regexp_replace(
                 regexp_split_to_array(robots_txt, '\\r?\\n')[u.pos],
                 '#.*$', ''
               )) AS l
        FROM {robots_cte},
             unnest(range(1,
               len(regexp_split_to_array(robots_txt, '\\r?\\n')) + 1))
               AS u(pos)
      )
      WHERE lower(regexp_extract(l, '{_DIRECTIVE_RE}', 1))
            IN ('user-agent', 'allow', 'disallow', 'crawl-delay')
    ),
    {p}_flagged AS (
      SELECT *, CASE WHEN directive = 'user-agent'
                      AND COALESCE(LAG(directive) OVER
                            (PARTITION BY host ORDER BY pos), '')
                          <> 'user-agent'
                     THEN 1 ELSE 0 END AS is_start
      FROM {p}_lines
    ),
    {p}_grouped AS (
      SELECT *, SUM(is_start) OVER (PARTITION BY host ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS group_id
      FROM {p}_flagged
    ),
    {p}_agents AS (
      SELECT host, group_id,
             list_sort(list(DISTINCT lower(value))) AS agents
      FROM {p}_grouped WHERE directive = 'user-agent'
      GROUP BY host, group_id
    ),
    {p}_hasagent AS (
      SELECT host, MAX(CASE WHEN list_contains(agents, '{a}')
                            THEN 1 ELSE 0 END) AS has_agent
      FROM {p}_agents GROUP BY host
    ),
    {p}_delays AS (
      SELECT g.host, g.group_id,
             TRY_CAST(g.value AS DOUBLE) AS crawl_delay, a.agents
      FROM {p}_grouped g JOIN {p}_agents a
        ON a.host = g.host AND a.group_id = g.group_id
      WHERE g.directive = 'crawl-delay'
        AND TRY_CAST(g.value AS DOUBLE) IS NOT NULL
    ),
    {p}_delay AS (
      SELECT d.host, MIN(d.crawl_delay) AS crawl_delay
      FROM {p}_delays d JOIN {p}_hasagent h ON h.host = d.host
      WHERE (list_contains(d.agents, '{a}') AND h.has_agent = 1)
         OR (list_contains(d.agents, '*') AND h.has_agent = 0)
      GROUP BY d.host
    )"""


def parse_sitemap(
    df: DataFrame, *, xml_col: str = "sitemap_xml", host_col: str = "host"
) -> DataFrame:
    """Sitemap XML → (host, url, lastmod, is_index): the frontier seed
    extractor for the documents `robots_sitemaps` points at.  Handles
    both ``<urlset>`` leaves and ``<sitemapindex>`` indirections (the
    caller fetches index targets and recurses — I/O stays with the
    caller).  Declarative: ``regexp_extract_all`` over the entry blocks
    (sitemap's schema fixes one ``<loc>`` per entry, so per-entry
    regexes are exact, not heuristic), entity-decoded per the spec's
    escaping rules."""
    is_index = F.col(xml_col).contains("<sitemapindex")
    entry_tag = F.when(is_index, F.lit("sitemap")).otherwise(F.lit("url"))
    blocks = F.expr(
        f"regexp_extract_all({xml_col}, '(?s)<(?:sitemap|url)>(.*?)</(?:sitemap|url)>', 1)"
    )
    exploded = df.select(
        F.col(host_col).alias("host"),
        is_index.alias("is_index"),
        entry_tag.alias("_tag"),
        F.explode(blocks).alias("_block"),
    )
    unescape = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&apos;", "'"), ("&amp;", "&")]  # &amp; LAST (spec order)
    loc = F.regexp_extract("_block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    for ent, ch in unescape:
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    return exploded.select(
        "host",
        loc.alias("url"),
        F.nullif(
            F.regexp_extract("_block", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
        "is_index",
    ).where(F.col("url") != "")


def precap_frontier(
    urls: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
    cap: int,
) -> DataFrame:
    """Bound a frontier's per-host depth BEFORE any per-host window
    runs: hosts at or under ``cap`` URLs pass through untouched; deeper
    hosts keep a deterministic hash-selected subset of expected size
    ``cap`` (keep iff ``pmod(xxhash64(url), n_host) < cap`` — uniform
    over residues, seed fixed, so the same frontier always keeps the
    same candidates).

    This is the r12 scale fix (asked by the r11 verdict) for
    :func:`schedule_frontier`: the exact
    slot window partitions by host, so a monster host (100M URLs on one
    host is realistic) would otherwise sort its FULL depth through a
    single task before ``max_per_host`` filters.  The pre-cap makes the
    window input O(cap) per host.  Which ``max_per_host`` URLs of an
    over-cap host fetch today is policy-free (the dropped tail is
    tomorrow's frontier), so the hash selection loses nothing.

    NULL hosts (unparsable URLs) are one group like any other — the
    count join is null-safe, so they are neither dropped (a plain
    equality join would silently lose them) nor allowed to flood the
    one window partition they share.

    One extra map-side-combined count shuffle on host; the count table
    (one row per host) joins back broadcast-ish."""
    counts = urls.groupBy(F.col(host_col).alias("_sf_h")).agg(
        F.count("*").alias("_sf_hn")
    )
    return (
        urls.join(
            counts, F.col(host_col).eqNullSafe(F.col("_sf_h")), "left"
        )
        .where(
            (F.col("_sf_hn") <= cap)
            | (
                F.pmod(F.xxhash64(F.col(url_col)), F.col("_sf_hn"))
                < F.lit(cap)
            )
        )
        .drop("_sf_h", "_sf_hn")
    )


def sitemap_xml(
    df: DataFrame,
    *,
    bytes_col: str = "payload",
    host_col: str = "host",
    max_bytes: int = 1 << 24,
) -> DataFrame:
    """Raw sitemap bytes → (host, sitemap_xml): gzipped payloads
    (``sitemap.xml.gz``, magic ``1f 8b`` — the spec-sanctioned wire
    format) stream through the bounded member walker
    (`sources.warc.iter_gunzip_chunks`); plain XML passes through.
    Output is capped at ``max_bytes`` decompressed (the sitemap spec's
    own 50 MB limit class — and a bomb guard: memory is O(cap), never
    O(expansion)).  One Arrow-batched leg (decompression is the same
    I/O-adjacent shape as the WARC decode path); everything downstream
    (:func:`parse_sitemap`) stays JVM-side."""
    from ..sources.warc import iter_gunzip_chunks

    cap = int(max_bytes)

    @F.pandas_udf("string")
    def _decode(s: pd.Series) -> pd.Series:
        out = []
        for b in s:
            if b is None:
                out.append(None)
                continue
            raw = bytes(b)
            if raw[:2] == b"\x1f\x8b":
                chunks: list[bytes] = []
                total = 0
                for c in iter_gunzip_chunks(raw):
                    take = c[: cap - total]
                    chunks.append(take)
                    total += len(take)
                    if total >= cap:
                        break
                raw = b"".join(chunks)
            else:
                raw = raw[:cap]
            out.append(raw.decode("utf-8", "replace"))
        return pd.Series(out, dtype="object")

    return df.select(
        F.col(host_col).alias("host"),
        _decode(F.col(bytes_col).cast("binary")).alias("sitemap_xml"),
    )


def resolve_sitemap_index(
    df: DataFrame,
    fetch,
    *,
    xml_col: str = "sitemap_xml",
    host_col: str = "host",
    max_depth: int = 2,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Follow ``<sitemapindex>`` indirections to their ``<urlset>``
    leaves, bounded: (host, sitemap_xml) → (host, url, lastmod) leaf
    rows from every level up to ``max_depth`` index hops.

    ``fetch`` is caller-injected — ``fetch(targets)`` receives a
    DataFrame of (host, url) index targets and returns (host,
    sitemap_xml) for them (compose with :func:`sitemap_xml` for gz
    payloads) — so I/O stays with the caller, the
    `cdx.fetch_crawl_records` pattern.  The depth bound is the cycle
    guard (a sitemap index can reference itself); targets still
    unresolved at the bound are dropped.

    Each fetched level is SPILLED to parquet under ``scratch_dir`` and
    read back, because the level feeds BOTH the next round's emptiness
    probe and the returned leaves union: without the spill a lazy
    fetch leg (payload read + gunzip UDF) would re-execute once per
    downstream action per level.  Parquet-spill instead of
    ``persist()`` (r12 verdict: the old per-level persists were never
    released and accumulated in executor storage for the session's
    lifetime): nothing stays cached after the call returns and the
    checkpoint survives executor loss.  Before returning, the leaf
    set is EAGERLY materialized to ``{scratch}/leaves`` and every
    ``level_*`` dir is deleted through the Hadoop filesystem of the
    path itself (r13 verdict: the level spills accumulated across
    calls in a long session — nothing in the repo ever cleaned them,
    and the default path wasn't even returned); the returned frame
    reads the one small leaves dir, which lives until the caller
    deletes ``scratch_dir``.  When no index hop ever runs, nothing is
    written at all and the lazy leaf projection returns as-is.

    ``scratch_dir`` defaults to a subdirectory of the session's
    configured CHECKPOINT dir when one is set (the cluster-correct
    location: parquet tasks commit executor-side, so the path must be
    a shared filesystem), else a driver-local OS temp dir — correct on
    local[n]; a multi-node deployment without a checkpoint dir MUST
    pass a shared path (r13 review: a /tmp default would silently
    read back only driver-local files on a real cluster)."""
    parsed = parse_sitemap(df, xml_col=xml_col, host_col=host_col)
    leaves = parsed.where(~F.col("is_index")).select("host", "url", "lastmod")
    idx = parsed.where(F.col("is_index")).select("host", "url")
    spark = df.sparkSession
    base = scratch_dir
    if base is None:
        ckpt = spark.sparkContext.getCheckpointDir()
        base = (
            f"{ckpt.rstrip('/')}/sitemap_levels_{uuid.uuid4().hex}"
            if ckpt
            else tempfile.mkdtemp(prefix="sitemap_levels_")
        )
    levels: list[str] = []
    for depth in range(max_depth):
        if not idx.limit(1).count():
            break
        lvl = os.path.join(base, f"level_{depth}")
        parse_sitemap(fetch(idx)).write.mode("overwrite").parquet(lvl)
        levels.append(lvl)
        child = spark.read.parquet(lvl)
        leaves = leaves.union(
            child.where(~F.col("is_index")).select("host", "url", "lastmod")
        )
        idx = child.where(F.col("is_index")).select("host", "url")
    if levels:
        final = os.path.join(base, "leaves")
        leaves.write.mode("overwrite").parquet(final)
        hadoop_path = spark._jvm.org.apache.hadoop.fs.Path
        hconf = spark._jsc.hadoopConfiguration()
        for lvl in levels:
            p = hadoop_path(lvl)
            p.getFileSystem(hconf).delete(p, True)
        leaves = spark.read.parquet(final)
    return leaves


def schedule_frontier(
    urls: DataFrame,
    delays: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
    default_delay: float = 1.0,
    max_per_host: int | None = None,
    precap_slack: int = 8,
) -> DataFrame:
    """Politeness-respecting fetch schedule: each URL gets a per-host
    ``fetch_slot`` (0, 1, 2, … in deterministic ``url_col`` order) and
    a ``fetch_offset_sec`` = slot × the host's crawl delay
    (:func:`robots_crawl_delays` output; ``default_delay`` where a host
    published none).  ``max_per_host`` truncates deep hosts so one
    giant site cannot monopolize a crawl round — the dropped tail is
    tomorrow's frontier.

    All window + broadcast-join work: the delay table is one row per
    host and broadcasts; the slot window partitions by host, which is
    exactly the key the fetch fleet shards by anyway — the shuffle this
    costs is the shuffle the crawler needs.

    When ``max_per_host`` is set, hosts deeper than
    ``max(max_per_host * precap_slack, 64)`` are first bounded by
    :func:`precap_frontier` so the exact window never sorts a monster
    host's full depth in one task; the slack (expected-size multiple of
    the final cap) makes an under-fill vanishingly unlikely
    (binomial tail ≤ e^-cap/8; the 64 floor covers tiny
    ``max_per_host``).  Hosts at or under the pre-cap threshold are
    scheduled EXACTLY as without it."""
    src = urls
    if max_per_host is not None:
        cap = max(int(max_per_host) * precap_slack, 64)
        src = precap_frontier(
            urls, host_col=host_col, url_col=url_col, cap=cap
        )
    d = delays.select(
        F.col("host").alias("_dhost"), F.col("crawl_delay").alias("_delay")
    )
    w = Window.partitionBy(host_col).orderBy(url_col)
    out = (
        src.join(d, src[host_col] == d["_dhost"], "left")
        .withColumn("fetch_slot", F.row_number().over(w) - 1)
        .withColumn(
            "fetch_offset_sec",
            F.round(
                F.col("fetch_slot")
                * F.coalesce(F.col("_delay"), F.lit(float(default_delay))),
                3,
            ),
        )
        .drop("_dhost", "_delay")
    )
    if max_per_host is not None:
        out = out.where(F.col("fetch_slot") < max_per_host)
    return out
