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
