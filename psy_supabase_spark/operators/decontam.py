"""Benchmark decontamination — remove training docs that overlap an
evaluation set.

The standard methodology (GPT-3 appendix C, Gopher section A.3, The
Pile): a training document is contaminated iff it shares any verbatim
token n-gram (n≈8-13) with a benchmark/eval document; contaminated docs
are dropped before training so eval scores measure generalization, not
memorization.

Spark-first shape, built for the 100 TB / small-benchmark asymmetry:

- The corpus side is a MAP-SIDE explode of token n-grams — no distinct,
  no pre-aggregation, nothing shuffled at corpus width.
- The benchmark side (eval sets are ~10³-10⁵ docs by nature) collapses
  to DISTINCT grams and is BROADCAST into a left-semi join, so flagging
  costs one scan of the corpus plus a hash probe per gram.
- Only the matched doc ids are aggregated (``distinct`` over ids), so
  the single Exchange in the plan carries ids, not text.

Tokenization and the short-doc rule mirror :mod:`operators.dedup`'s
gram machinery (lowercase, split on non-alphanumerics; docs shorter
than ``n`` tokens contribute their whole joined text as one gram —
except zero-token docs, which emit NO gram: empty shares no content,
so it must never match), and one oracle-SQL spelling
(:func:`ngram_case_sql`) serves the family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import TOKEN_SPLIT_RE

DECONTAM_N = 8  # token n-gram size; 8 suits the short synthetic docs
                # (GPT-3 used 13-grams on web-scale pages)


def token_ngram_rows(
    docs: DataFrame, n: int = DECONTAM_N, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram) token n-gram rows, fully codegen'd and shuffle-free —
    :func:`operators.dedup.gram_rows` generalized from trigrams to ``n``:
    ``arrays_zip`` of the token array with its n-1 successor slices, rows
    whose last member is NULL (the <n-token tails) dropped.  NOT
    deduplicated: callers that only need matched ids (decontamination)
    skip the corpus-wide distinct shuffle entirely."""
    joined_expr = F.trim(F.regexp_replace(F.lower(F.col(text_col)), TOKEN_SPLIT_RE, " "))
    arr = F.col("arr")
    zipped = F.arrays_zip(
        arr.alias("w0"),
        *[F.slice(arr, k + 1, F.size(arr)).alias(f"w{k}") for k in range(1, n)],
    )
    grams = (
        docs.select(F.col(id_col).alias("id"), F.split(joined_expr, " ").alias("arr"))
        .select("id", F.explode(zipped).alias("t"))
        .where(F.col(f"t.w{n - 1}").isNotNull() & (F.col("t.w0") != ""))
        .select("id", F.concat_ws(" ", *[f"t.w{k}" for k in range(n)]).alias("gram"))
    )
    joined = F.trim(F.regexp_replace(F.lower(F.col(text_col)), TOKEN_SPLIT_RE, " "))
    n_tokens = F.when(joined == "", F.lit(0)).otherwise(F.size(F.split(joined, " ")))
    # zero-token docs emit NO gram (an empty doc shares no content, so it
    # must never match anything — including another empty doc); fuzz
    # caught the '' gram as both wrong and engine-divergent (DuckDB's
    # array_to_string([], ' ') is NULL, not '')
    short = (
        docs.select(F.col(id_col).alias("id"), joined.alias("gram"), n_tokens.alias("_n"))
        .where((F.col("_n") < n) & (F.col("_n") > 0))
        .select("id", "gram")
    )
    return grams.unionByName(short)


def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_N,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id) of corpus docs sharing ≥1 token n-gram with any benchmark
    doc.  Exact (joins on the gram string, not a hash — no collision
    false-positives); the benchmark gram set is broadcast."""
    bench = benchmark.select(F.lit(0).alias("_bid"), F.col(bench_text_col).alias("_btext"))
    bench_grams = (
        token_ngram_rows(bench, n, id_col="_bid", text_col="_btext").select("gram").distinct()
    )
    corpus_grams = token_ngram_rows(corpus, n, id_col=id_col, text_col=text_col)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(F.col("id").alias(id_col))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_N,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti on the flagged id set —
    the id set is tiny relative to the corpus, so the anti-join is
    broadcast under AQE)."""
    flagged = contaminated_ids(
        corpus, benchmark, n, id_col=id_col, text_col=text_col, bench_text_col=bench_text_col
    )
    return corpus.join(flagged, id_col, "left_anti")


def ngram_case_sql(n: int = DECONTAM_N, t: str = "t") -> str:
    """DuckDB mirror of :func:`token_ngram_rows` over a token-list column
    ``t`` — the ``operators.dedup._GRAMS`` CASE generalized to ``n``
    (list comprehension of joined n-token windows; whole text for
    <n-token docs)."""
    window = " || ' ' || ".join(f"{t}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({t}) = 0 THEN [] "
        f"WHEN len({t}) < {n} THEN [array_to_string({t}, ' ')] "
        f"ELSE [{window} for i in range(1, greatest(len({t}) - {n - 1}, 0) + 1)] END"
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = DECONTAM_N,
    *,
    text_col: str = "text",
    bench_text_col: str = "text",
    flag_col: str = "is_contaminated",
) -> DataFrame:
    """Append a per-row contamination boolean — the STREAM-SAFE twin.

    :func:`decontaminate`'s anti-join needs the flagged-id set on the
    join's right, which Spark forbids when that set derives from the
    stream itself (LeftAnti with a streaming right).  This spelling is
    fully stateless: each row builds its token n-gram ARRAY map-side
    (:func:`functions.quality._token_ngrams` + the whole-text short-doc
    gram) and probes a one-row broadcast of the benchmark's distinct
    grams with ``arrays_overlap``.  Works identically on batch and
    ``readStream`` frames (equivalence pinned in tests).

    Scale shape: the benchmark-gram array is one broadcast row; the probe
    is O(|doc grams| x |bench grams|) per row worst-case (arrays_overlap
    short-circuits on first hit), so prefer :func:`decontaminate`'s
    hash-probe for batch and this for streaming admission control where
    the benchmark is eval-set-sized by nature.
    """
    from ..functions.quality import _token_ngrams

    bench = benchmark.select(F.lit(0).alias("_bid"), F.col(bench_text_col).alias("_btext"))
    bench_grams = (
        token_ngram_rows(bench, n, id_col="_bid", text_col="_btext")
        .select("gram")
        .distinct()
        .agg(F.collect_set("gram").alias("_bench_grams"))
    )

    # MATERIALIZE the token array before the gram lambda: _token_ngrams
    # reads k-1 successors per gram via element_at(toks, ·), and a bare
    # expression tree there makes every element_at re-run the whole
    # regexp_replace+split on the document text (~n_tokens·(k-1) regex
    # passes per row — measured 87 s at sf0.1 vs 0.9 s with the projected
    # column; Catalyst does not CSE inside lambda bodies)
    joined = F.trim(F.regexp_replace(F.lower(F.col(text_col)), TOKEN_SPLIT_RE, " "))
    staged = corpus.withColumn("_fc_joined", joined).withColumn(
        "_fc_toks", F.split(F.col("_fc_joined"), " ")
    )
    jc, toks = F.col("_fc_joined"), F.col("_fc_toks")
    n_tokens = F.when(jc == "", F.lit(0)).otherwise(F.size(toks))
    grams = (
        F.when(n_tokens == 0, F.array().cast("array<string>"))
        .when(n_tokens < n, F.array(jc))
        .otherwise(F.filter(_token_ngrams(toks, n), lambda g: g != ""))
    )
    return (
        staged.crossJoin(F.broadcast(bench_grams))
        .withColumn(flag_col, F.arrays_overlap(grams, F.col("_bench_grams")))
        .drop("_bench_grams", "_fc_joined", "_fc_toks")
    )
