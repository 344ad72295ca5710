"""HTML → text extraction — the WET-style ingest stage.

Web-corpus pipelines (C4 from WET files; RefinedWeb/FineWeb run
trafilatura) start from markup; this engine ingests the extracted-text
parquet, but a complete corpus-prep surface needs the extraction stage
itself.  This is the DETERMINISTIC regex spelling: a chain of
``regexp_replace`` in whole-stage codegen (zero Python, rides the scan),
written in the Java-regex/RE2 common subset (the :mod:`functions.pii`
dialect rule) so a DuckDB oracle replays the exact expressions.

What it does: drops <script>/<style> subtrees and comments, turns block
boundaries into newlines, strips remaining tags, decodes the common
named entities, collapses whitespace.  What it does NOT do: DOM
repair, boilerplate/nav removal, numeric-entity decoding, or main-
content detection — that is a trafilatura-class model problem; at
production scale wire a real extractor through ``mapInPandas`` behind a
container gate (the :mod:`operators.multimodal` pattern) and keep this
as the fast path / fallback.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


# (pattern, replacement) chain — ORDER MATTERS (subtree drops before tag
# strip; entity decode after tag strip so "&lt;p&gt;" never becomes a
# strippable tag — the classic double-decode injection).  Every pattern
# parses identically under java.util.regex and RE2 ((?is) inline flags,
# lazy quantifiers, no lookbehind).
HTML_CHAIN: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/ul|/ol|/table|/blockquote)[^>]*>", "\n"),
    (r"(?s)<[^>]+>", " "),
    # entity decode: &amp; LAST, or "&amp;lt;" (renders as "&lt;") would
    # double-decode to "<" — the other half of the injection-order rule
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"[ \t\r\f]+", " "),          # collapse horizontal space
    (r" ?\n ?", "\n"),             # trim around newlines
    (r"\n{2,}", "\n"),             # collapse blank lines
    (r"(?s)^\s+|\s+$", ""),        # edge strip (trim() leaves \n alone)
]


def html_to_text(col: ColumnOrName) -> Column:
    """Extracted text from an HTML string — pure codegen chain."""
    out = _c(col)
    for pat, rep in HTML_CHAIN:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_oracle_sql(src: str) -> str:
    """DuckDB mirror: the SAME chain as nested regexp_replace('g') calls
    built from ``HTML_CHAIN`` — one source of truth, the two engines
    cannot drift."""
    out = src
    for pat, rep in HTML_CHAIN:
        p = pat.replace("'", "''")
        if "\n" in rep:
            rlit = "e'" + rep.replace("\n", "\\n") + "'"
        else:
            rlit = "'" + rep.replace("'", "''") + "'"
        # inline (?is) flags ride inside the pattern in both engines;
        # DuckDB only needs the 'g' option
        out = f"regexp_replace({out}, '{p}', {rlit}, 'g')"
    return f"trim({out})"
