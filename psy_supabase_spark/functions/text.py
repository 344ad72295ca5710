"""Text normalization / classification / scoring as Catalyst expressions.

Re-expresses the reference's Python text stack (SURVEY.md §2.8) UDF-free:
- ``clean_text``: regex normalization chain (reference
  `utilities/text_utils.py:26-48` — unicode/HTML unescape, smart-quote
  replacement, whitespace collapse; the SQL-quote-doubling step is an
  injection artifact and is deliberately dropped).
- safety classifier: ordered first-match-wins regex CASE (reference
  `safety_handler.py:18-78`).
- template / taxonomy keyword CASE (reference `prompt_selector.py:37-58,
  198-202`).
- response-length buckets, term-overlap, template-adherence scores
  (reference `prompt_selector.py:320-355`).
- LLM-data-pipeline extensions: token counting, quality scoring,
  stopword-ratio language heuristic.

Everything here compiles to whole-stage-codegen'd JVM expressions.  Oracle
portability note: Spark ``regexp_replace`` is replace-ALL; DuckDB needs the
``'g'`` flag — oracle SQL in __spark_entry__ passes it explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


URL_RE = r"(https?://\S+|www\.\S+)"

# Reference safety patterns (safety_handler.py:18-44), simplified to a
# portable alternation per category; first match wins.
SAFETY_PATTERNS: list[tuple[str, str, str]] = [
    ("suicide", "critical", r"(suicide|kill myself|end my life|don'?t want to live)"),
    ("self_harm", "high", r"(self[- ]?harm|hurt myself|cutting myself)"),
    ("violence", "high", r"(kill (him|her|them)|hurt (someone|somebody|others))"),
]

# Reference template keyword lists (prompt_selector.py:37-58); first match wins.
TEMPLATE_KEYWORDS: list[tuple[str, list[str]]] = [
    ("Question", ["how", "what", "why", "when", "where", "who"]),
    ("Empathy and Validation", ["feel", "feeling", "felt", "alone", "lonely"]),
    ("Affirmation and Reassurance", ["afraid", "scared", "worried", "anxious"]),
    ("Providing Suggestions", ["should", "advice", "suggest", "help me"]),
    ("Information", ["explain", "information", "tell me about"]),
]

# Mental-health topic taxonomy (reference utilities/text_utils.py:128-215),
# reduced to a deterministic keyword map for the argmax classifier (A1).
TAXONOMY: dict[str, list[str]] = {
    "anxiety": ["anxious", "anxiety", "panic", "worry", "worried", "nervous"],
    "depression": ["depressed", "depression", "hopeless", "empty", "worthless"],
    "trauma": ["trauma", "abuse", "flashback", "nightmare", "ptsd"],
    "relationships": ["relationship", "partner", "marriage", "divorce", "breakup"],
    "stress": ["stress", "stressed", "overwhelmed", "burnout", "pressure"],
    "emotional_support": [],  # default topic (prompt_selector.py:299-300)
}

# English stopword core for ratios / language heuristic, minus the
# reference's keep-words (pronouns/be/have/do — utilities/keep_words.py).
# keep-words parity (reference utilities/keep_words.py:16-19): pronouns +
# be/have/do forms survive stopword stripping.
KEEP_WORDS = ["i", "you", "he", "she", "we", "they", "me", "my", "your",
              "am", "is", "are", "was", "were", "be", "have", "has", "do", "does"]

STOPWORDS = [
    "the", "a", "an", "and", "or", "but", "if", "then", "of", "at", "by",
    "for", "with", "about", "to", "from", "in", "on", "off", "over", "under",
    "this", "that", "these", "those", "as", "is", "are", "was", "were",
]


def strip_urls(col: ColumnOrName) -> Column:
    """URL removal (reference prompt_selector.py:68)."""
    return F.regexp_replace(_c(col), URL_RE, "")


def clean_text(col: ColumnOrName) -> Column:
    """Normalization chain (reference utilities/text_utils.py:26-48):
    smart quotes → ASCII, em-dash/ellipsis replacement, control/charset
    strip, whitespace collapse, trim.  Pure regexp_replace chain."""
    c = _c(col)
    c = F.regexp_replace(c, "[‘’]", "'")
    c = F.regexp_replace(c, "[“”]", '"')
    c = F.regexp_replace(c, "—", "-")
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, r"[^a-zA-Z0-9\s.,!?'\"-]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokenize(col: ColumnOrName) -> Column:
    """Lowercase word tokens (the engine's cheap tokenizer — the reference's
    spaCy lemmatizer T3 is a pandas-UDF extension point, see
    operators/ml_udfs).  Split on non-alphanumerics, drop empties."""
    toks = F.split(F.lower(_c(col)), r"[^a-z0-9']+")
    return F.filter(toks, lambda t: t != "")


def s_stem(tok: Column) -> Column:
    """Harman's S-stemmer (Harman 1991, "How effective is suffixing?",
    JASIS 42(1)) — the published three-rule plural stripper, as a pure
    CASE cascade (first applicable rule wins):

    1. ``ies`` → ``y``   unless the word ends ``eies`` / ``aies``
    2. ``es``  → ``e``   unless the word ends ``aes`` / ``ees`` / ``oes``
    3. drop final ``s``  unless the word ends ``us`` / ``ss``

    This is the engine's ORACLE-GATEABLE stemming tier for T3 (SURVEY
    §2): unlike Porter/Snowball (measure-based conditions, no DuckDB
    mirror in this container), every rule is a suffix test both engines
    spell identically — and all patterns are RE2-safe (no lookbehind),
    so the DuckDB twin uses the same regexes verbatim.  The spaCy
    lemmatizer stays the container-gated full-strength extension."""
    return (
        F.when(
            tok.rlike("ies$") & ~tok.rlike("[ea]ies$"),
            F.regexp_replace(tok, "ies$", "y"),
        )
        .when(
            tok.rlike("es$") & ~tok.rlike("[aeo]es$"),
            F.regexp_replace(tok, "s$", ""),
        )
        .when(
            tok.rlike("s$") & ~tok.rlike("(us|ss)$"),
            F.regexp_replace(tok, "s$", ""),
        )
        .otherwise(tok)
    )


def s_stem_sql(var: str) -> str:
    """DuckDB spelling of :func:`s_stem` over token variable ``var`` —
    the identical rule cascade with the identical (RE2-safe) regexes."""
    return (
        f"CASE WHEN regexp_matches({var}, 'ies$') AND NOT regexp_matches({var}, '[ea]ies$')"
        f" THEN regexp_replace({var}, 'ies$', 'y')"
        f" WHEN regexp_matches({var}, 'es$') AND NOT regexp_matches({var}, '[aeo]es$')"
        f" THEN regexp_replace({var}, 's$', '')"
        f" WHEN regexp_matches({var}, 's$') AND NOT regexp_matches({var}, '(us|ss)$')"
        f" THEN regexp_replace({var}, 's$', '')"
        f" ELSE {var} END"
    )


def token_count(col: ColumnOrName) -> Column:
    """Whitespace token count (reference prompt_selector.py:325)."""
    return F.size(F.filter(F.split(_c(col), r"\s+"), lambda t: t != ""))


def length_bucket_from_count(n: Column) -> Column:
    """Staged twin of length_bucket over a precomputed token count."""
    return (
        F.when(n < 20, F.lit("too_short")).when(n <= 500, F.lit("appropriate")).otherwise(F.lit("too_long"))
    )


def length_bucket(col: ColumnOrName) -> Column:
    """<20 → too_short, 20-500 → appropriate, >500 → too_long (reference
    prompt_selector.py:325-330)."""
    return length_bucket_from_count(token_count(col))


def safety_struct(col: ColumnOrName) -> Column:
    """Ordered regex harm classifier: first-match-wins CASE returning a
    (category, severity) struct, NULL when safe (reference
    safety_handler.py:46-78)."""
    q = F.lower(_c(col))
    expr = F.lit(None).cast("struct<category:string,severity:string>")
    # build WHENs in reverse so the first pattern ends up outermost
    for category, severity, pattern in reversed(SAFETY_PATTERNS):
        expr = F.when(
            q.rlike(pattern),
            F.struct(F.lit(category).alias("category"), F.lit(severity).alias("severity")),
        ).otherwise(expr)
    return expr


def safety_category(col: ColumnOrName) -> Column:
    return safety_struct(col).getField("category")


def select_template(col: ColumnOrName) -> Column:
    """Keyword → template CASE, first match wins, default 'Others'
    (reference prompt_selector.py:198-202)."""
    q = F.lower(_c(col))
    expr: Column = F.lit("Others")
    for name, kws in reversed(TEMPLATE_KEYWORDS):
        pat = "(" + "|".join(kws) + ")"
        expr = F.when(q.rlike(pat), F.lit(name)).otherwise(expr)
    return expr


def term_overlap(question: ColumnOrName, response: ColumnOrName) -> Column:
    """|Q∩R| / |Q| over distinct lowercase tokens (reference
    prompt_selector.py:332-346).  NULL when the question has no tokens."""
    qt = F.array_distinct(tokenize(question))
    rt = F.array_distinct(tokenize(response))
    nq = F.size(qt)
    return F.when(nq == 0, F.lit(None).cast("double")).otherwise(
        F.size(F.array_intersect(qt, rt)).cast("double") / nq.cast("double")
    )


def template_adherence(template: ColumnOrName, response: ColumnOrName) -> Column:
    """'Question' template + '?' → high; 'Empathy and Validation' +
    understand/feel/valid → high; else medium (reference
    prompt_selector.py:348-355)."""
    r = F.lower(_c(response))
    return (
        F.when((_c(template) == "Question") & r.contains("?"), F.lit("high"))
        .when(
            (_c(template) == "Empathy and Validation") & r.rlike("(understand|feel|valid)"),
            F.lit("high"),
        )
        .otherwise(F.lit("medium"))
    )


def stopword_ratio_from_tokens(toks: Column) -> Column:
    """Staged twin of stopword_ratio over a precomputed token array."""
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def stopword_ratio(col: ColumnOrName) -> Column:
    """Fraction of tokens that are core-English stopwords — quality +
    language-ID signal.  0.0 for empty docs."""
    return stopword_ratio_from_tokens(tokenize(col))


def quality_score_from(c: Column, n: Column, sw_ratio: Column) -> Column:
    """Staged twin of quality_score over precomputed token count and
    stopword ratio (the text column is still needed for the punct rule)."""
    len_ok = F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(c, r"[^!?.,;:]", ""))
    punct_ok = F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.when(punct.cast("double") / F.length(c).cast("double") <= 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    sw_ok = F.when(sw_ratio >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + sw_ok) / 3.0, 6)


def quality_score(col: ColumnOrName) -> Column:
    """Composite [0,1] quality heuristic for training-data filtering:
    mean of (length-in-range, punctuation-not-excessive, has-stopwords).
    Deterministic + SQL-portable."""
    c = _c(col)
    return quality_score_from(c, token_count(c), stopword_ratio(c))


LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "est", "une"],
    "es": ["el", "los", "que", "una", "por"],
}


def lang_id(col: ColumnOrName) -> Column:
    """Marker-stopword language heuristic: pick the language with the most
    distinct marker hits among tokens; 'und' (undetermined) when no marker
    matches.  Deterministic tie-break: language name ASC."""
    return lang_id_from_tokens(F.array_distinct(tokenize(col)))


def lang_id_from_tokens(toks: Column) -> Column:
    """Staged twin of lang_id over a precomputed DISTINCT token array."""
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array([F.lit(m) for m in markers]))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    expr: Column = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr
