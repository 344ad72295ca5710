"""Corpus-level heavy hitters (exact top-k token frequencies) at scale.

A 100 TB training corpus needs its most-frequent tokens/n-grams for
stopword induction, boilerplate detection and tokenizer vocab seeding.
The naive Spark plan — explode every token, ``groupBy(token).count()``,
take k — is correct and map-side-combined, but its shuffle carries one
row per *distinct token per partition*: on web-scale text that is
billions of rows and a spill-prone hash aggregate, all to answer a
question whose output is k rows.

``top_tokens`` therefore implements the textbook two-pass *exact*
heavy-hitters scheme built from mergeable Misra-Gries summaries
(Misra & Gries 1982, "Finding repeated elements"; mergeability per
Agarwal et al. 2012, "Mergeable summaries", PODS):

1. **Candidate pass** — one ``mapInPandas`` scan keeps a Misra-Gries
   summary of ``capacity`` counters per partition (decrement-all when
   full).  Each partition emits ≤ capacity ``(token, weight)`` rows plus
   one NULL-token sentinel carrying its true token total.  The union of
   summaries, summed per token, undercounts any token by at most
   ``N / (capacity + 1)`` (N = total tokens) and *contains every token
   with true count above that bound* — the merged-MG guarantee.  The
   shuffle is ≤ capacity·partitions rows regardless of vocabulary size.
2. **Exact recount** — candidates are pruned to those whose estimate
   could still reach the k-th place (est + N/(cap+1) ≥ k-th estimate),
   then recounted exactly with a broadcast ``isin`` filter on a second
   tokenize-explode scan (map-side combine on ≤ |candidates| keys — no
   wide hash aggregate).  The top k by exact count (tie-break: token
   ascending) is returned.

The result is PROVABLY the exact top-k whenever the k-th recounted
count exceeds ``N/(capacity+1)``; the operator checks that certificate
and raises (loud valve, never silently approximate) when capacity was
too small for the stream — callers retry with a bigger summary.

Scale story: pass 1 is embarrassingly parallel with O(capacity) state
per task and a k·P-bounded shuffle; pass 2 shuffles ≤ |candidates|
keys.  Driver memory holds only the candidate list (≤ ~4k·slack ids).
No reference analog (psy-supabase has no corpus analytics); this is the
training-pipeline extension surface.

STATUS (r9): the two-pass scheme is a MEMORY-BOUNDED FALLBACK, not the
default route — measured from both sides of the old routing threshold
(tools/hh_crossover.py, V = 1M/5M/10M distinct by construction), the
declarative exact plan won every rung by ~1.5× with no spill knee, so
``top_tokens_auto`` now always picks exact unless the caller opts into
MG with a finite ``mg_min_distinct``.  MG's value is its O(capacity)
state / capacity·P shuffle GUARANTEE where the exact aggregate's memory
would be the binding constraint, not wall-clock.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

__all__ = [
    "top_tokens",
    "top_tokens_auto",
    "top_tokens_exact",
    "route_top_tokens",
    "estimate_distinct_units",
    "mg_candidates",
]

# Above this many pruned candidates, the exact recount switches from an
# isin literal list to a broadcast left-semi join: Catalyst handles a
# few thousand In-list literals fine, but a 100k+ literal expression
# bloats plan construction, driver memory and optimizer time.
_ISIN_LITERAL_CUTOFF = 4096


def _ngrams_nolambda(toks, k: int):
    """Space-joined word k-grams WITHOUT referencing the token array
    inside any lambda: zip_with over k shifted slices, concatenating
    pairwise.  Values are identical to quality._token_ngrams (same
    space join, same n-k+1 windows) — but that spelling calls
    element_at(toks, ·) inside a transform lambda, and Catalyst
    re-evaluates a non-attribute argument expression PER ELEMENT: with
    tokenize() inlined underneath, each document was re-split once per
    gram per position (measured 45 s vs 1.4 s for the identical
    trigram count at sf0.1 — and an intermediate projection does not
    protect, CollapseProject can inline it right back).  Here `toks`
    only appears in top-level slice/size expressions, evaluated once
    per row each, so the spelling is safe for ANY argument."""
    n = F.size(toks)
    shifted = [F.slice(toks, j + 1, n - (k - 1)) for j in range(k)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def _units_df(docs: DataFrame, text_col: str, ngram: int) -> DataFrame:
    """One-column frame of counting units: word tokens (ngram=1) or
    space-joined word n-grams.  N-grams are the unit that matters for
    boilerplate detection: a 31-word synthetic vocabulary is trivial at
    n=1 but its bigram/trigram space is where the frequency skew
    lives.

    Small-input spread: a single-row-group parquet file scans as ONE
    task, serializing the tokenize/n-gram work this operator exists to
    parallelize.  When the scan has fewer partitions than half the
    default parallelism, the narrow text column is repartitioned first
    (a few-hundred-KB shuffle next to the CPU it unlocks).  At real
    scale input splits ≫ cores, the branch never fires, and filter
    pushdown is unaffected (the projection reads one column)."""
    narrow = docs.select(F.col(text_col).alias("_text"))
    dp = docs.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < max(2, dp // 2):
        narrow = narrow.repartition(dp)
    toks = tokenize("_text")
    if ngram == 1:
        return narrow.select(toks.alias("_toks"))
    return narrow.select(_ngrams_nolambda(toks, ngram).alias("_toks"))


def mg_candidates(
    docs: DataFrame,
    *,
    text_col: str = "text",
    capacity: int = 4096,
    ngram: int = 1,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(token, w)`` rows with
    ``w`` the summary's surviving counter (a lower bound on the
    partition-local count), plus one ``token IS NULL`` sentinel row per
    partition whose ``w`` is the partition's TRUE total token count —
    so one scan yields both the merged summary and N.

    The per-batch step is the VECTORIZED mergeable-summaries form
    (Agarwal et al. 2012 §3.1) rather than token-at-a-time MG: count
    the Arrow batch exactly (``value_counts`` — the batch vocabulary is
    bounded by the batch), MERGE into the running summary (counter-wise
    add, zero error), then REDUCE back to ``capacity`` by subtracting
    the (capacity+1)-th largest counter from all and dropping the
    non-positive.  Each reduce removes ≥ (capacity+1)·v occurrences of
    mass, so the subtracted v's telescope to ≤ n/(capacity+1) — the
    identical Misra-Gries undercount bound, at numpy speed.

    A second sentinel row (``token = ''`` — impossible as a real token,
    the tokenizer drops empties) carries the partition's ACTUAL
    cumulative subtracted mass Σv.  Its cross-partition sum is a tight
    upper bound on any token's undercount — zero when no summary ever
    overflowed, in which case the merged summary is simply the exact
    vocabulary count."""
    toks_df = _units_df(docs, text_col, ngram)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        total = 0
        removed = 0
        for pdf in batches:
            lists = [
                np.asarray(t, dtype=object)
                for t in pdf["_toks"]
                if t is not None and len(t)
            ]
            if not lists:
                continue
            flat = np.concatenate(lists)
            total += len(flat)
            bc = pd.Series(flat).value_counts()
            counters = bc if counters is None else counters.add(bc, fill_value=0)
            if len(counters) > capacity:
                v = int(counters.nlargest(capacity + 1).iloc[-1])
                counters = counters[counters > v] - v
                removed += v
        tokens: list = [] if counters is None else counters.index.tolist()
        ws: list = [] if counters is None else counters.astype("int64").tolist()
        yield pd.DataFrame(
            {"token": tokens + [None, ""], "w": ws + [total, removed]}
        )

    return toks_df.mapInPandas(summarize, schema="token string, w long")


def top_tokens_exact(
    docs: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Baseline single-pass declarative top-k token frequency:
    explode → groupBy → TakeOrdered.  Map-side combined by Catalyst,
    but the shuffle is distinct-tokens-per-partition wide — the plan
    to benchmark :func:`top_tokens` against, and the oracle twin
    (``ORDER BY cnt DESC, token LIMIT k`` in SQL)."""
    return (
        _units_df(docs, text_col, ngram)
        .select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


def route_top_tokens(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ngram: int = 1,
    sample_docs: int = 2_000,
    mg_min_distinct: float = float("inf"),
) -> str:
    """Pick "mg" or "exact" for :func:`top_tokens_auto`.

    MG IS DEMOTED BY DEFAULT (r8 verdict, measured r9 from BOTH sides of
    the old 5M threshold — tools/hh_crossover.py, recorded in
    SCALE_STEP_EXTRA.json ``hh_crossover``): on corpora whose
    distinct-unigram count was dialed by construction to 1M / 5M / 10M
    (hot head + unique tail, MG certificate holding at capacity 4096
    throughout), the declarative exact plan won every rung — 3.8 vs
    8.2 s, 16.8 vs 25.7 s, 33.0 vs 49.4 s — including 2× PAST the old
    threshold.  The exact plan's hash aggregate scaled linearly with V
    with no spill knee on a 128 GiB / 32-thread box, so MG's two-scan
    premium (~1.5×) is structural here, and the default
    ``mg_min_distinct`` is +inf: the route always picks exact.

    MG remains available as an explicitly-requested MEMORY-BOUNDED
    fallback (pass a finite ``mg_min_distinct``, or call
    :func:`top_tokens` directly) for deployments where the binding
    constraint is executor memory, not time: its per-task state is
    O(capacity) and its shuffle ≤ capacity·partitions regardless of V,
    a guarantee the exact plan cannot make when billions of distinct
    grams exceed what the aggregate can spill through.  Both routes
    return exact answers, so routing is never a correctness decision.

    Estimate: approx_count_distinct over the exploded units of a
    ``sample_docs``-row slice (one bounded scan — never the full
    corpus), extrapolated by Heaps' law V(N) ≈ V(n)·(N/n)^0.7.  The r9
    measurement also showed this UNDERSHOOTS on linear-vocab corpora
    (est 2.5M at true 10M) — another reason a finite threshold must be
    chosen deliberately, per-deployment, not defaulted.

    With the default ``mg_min_distinct=inf`` the estimate cannot change
    the answer, so the route short-circuits to "exact" without paying
    the count + sample-explode + approx-distinct jobs."""
    import math

    if not math.isfinite(mg_min_distinct):
        return "exact"
    est_distinct = estimate_distinct_units(
        docs, text_col=text_col, ngram=ngram, sample_docs=sample_docs
    )
    return "mg" if est_distinct > mg_min_distinct else "exact"


def estimate_distinct_units(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ngram: int = 1,
    sample_docs: int = 2_000,
) -> float:
    """The routing estimate behind :func:`route_top_tokens`, exposed so
    the crossover experiment (tools/hh_crossover.py) can record the
    estimate alongside the measured true distinct count: approx distinct
    units over a bounded ``sample_docs`` slice, Heaps-extrapolated
    (β=0.7) to the full corpus.  Returns 0.0 for an empty corpus."""
    n_docs = docs.count()
    if n_docs == 0:
        return 0.0
    sample = docs.limit(min(sample_docs, n_docs))
    v_sample = (
        _units_df(sample, text_col, ngram)
        .select(F.explode("_toks").alias("token"))
        .agg(F.approx_count_distinct("token").alias("v"))
        .head()[0]
    )
    return v_sample * (max(n_docs, 1) / max(min(sample_docs, n_docs), 1)) ** 0.7


def top_tokens_auto(
    docs: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
    capacity: int = 4096,
    max_candidates: int = 200_000,
    ngram: int = 1,
    mg_min_distinct: float = float("inf"),
) -> tuple[DataFrame, str]:
    """(result, route): EXACT top-k via the route picked by
    :func:`route_top_tokens` — which, since the r9 both-sides crossover
    measurement (see its docstring), defaults to the single-scan
    declarative plan ALWAYS.  Pass a finite ``mg_min_distinct`` to
    re-enable MG as a memory-bounded fallback for corpora whose
    distinct-unit count would blow the exact plan's hash aggregate;
    that path runs with ``auto_grow`` certificate retries."""
    route = route_top_tokens(
        docs,
        text_col=text_col,
        ngram=ngram,
        mg_min_distinct=mg_min_distinct,
    )
    if route == "exact":
        return top_tokens_exact(docs, k, text_col=text_col, ngram=ngram), route
    return (
        top_tokens(
            docs,
            k,
            text_col=text_col,
            capacity=capacity,
            max_candidates=max_candidates,
            ngram=ngram,
            auto_grow=True,
        ),
        route,
    )


def top_tokens(
    docs: DataFrame,
    k: int = 50,
    *,
    text_col: str = "text",
    capacity: int = 4096,
    max_candidates: int = 200_000,
    ngram: int = 1,
    auto_grow: bool = False,
) -> DataFrame:
    """EXACT top-k tokens via MG candidates + exact recount (see module
    docstring).  Returns ``(token, cnt)`` ordered cnt DESC, token ASC —
    row-identical to :func:`top_tokens_exact` whenever the exactness
    certificate holds; raises LOUDLY otherwise (never silently
    approximate).

    Crossover guidance (r7 verdict #5): this two-scan scheme only beats
    :func:`top_tokens_exact` when the naive plan's shuffle is
    vocabulary-bound (distinct units ≫ capacity·partitions) — on a
    small-vocab corpus it pays ~1.5× for nothing.  Use
    :func:`top_tokens_auto` to route on an estimated distinct count.

    ``auto_grow``: on a certificate failure, restart the whole two-pass
    scheme with capacity ×4, twice (each retry is a fresh pair of
    scans, priced accordingly); re-raises after 16× the starting
    capacity.  Near-uniform streams (no true heavy hitters) need
    capacity ≳ distinct-count to certify — MG buys nothing there, by
    construction.

    The certificate uses the ACTUAL merged subtracted mass ``err``
    (sum of the reduce-step v's across partitions — 0 when no summary
    overflowed), a far tighter bound than the worst-case N/(cap+1):
    every non-candidate token has true count ≤ err, so the answer is
    certified exact iff the k-th recounted count > err, or the summary
    never overflowed (candidates ARE the vocabulary).

    Driver state: the merged summary's candidate rows (≤ the smaller of
    ``max_candidates`` and capacity·partitions; the prune keeps only
    tokens whose upper bound est+err reaches the k-th estimate).  Over
    ``max_candidates`` raises — the certificate would likely fail
    anyway, and the valve keeps the driver fetch bounded by contract.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if auto_grow:
        last: ValueError | None = None
        for cap in (capacity, capacity * 4, capacity * 16):
            try:
                return top_tokens(
                    docs,
                    k,
                    text_col=text_col,
                    capacity=cap,
                    max_candidates=max_candidates,
                    ngram=ngram,
                )
            except ValueError as e:
                if "certificate" not in str(e):
                    raise
                last = e
        raise last
    summary = mg_candidates(docs, text_col=text_col, capacity=capacity, ngram=ngram)
    merged = (
        summary.groupBy("token")
        .agg(F.sum("w").alias("est"))
        .withColumn(
            "_sentinel", F.col("token").isNull() | (F.col("token") == "")
        )
    )
    # ONE bounded driver fetch gets N + err (the two sentinel sums) and
    # the pruned candidate list together: candidates ordered est DESC so
    # the k-th estimate is computable client-side without a second job.
    rows = (
        merged.orderBy(F.desc("_sentinel"), F.desc("est"), F.asc("token"))
        .limit(max_candidates + 3)
        .collect()
    )
    sentinels = {r.token: r.est for r in rows if r._sentinel}
    cands = [(r.token, r.est) for r in rows if not r._sentinel]
    if None not in sentinels:  # empty input: no partition emitted
        return top_tokens_exact(docs.limit(0), k, text_col=text_col, ngram=ngram)
    err = sentinels.get("", 0)  # actual total subtracted mass
    if len(cands) > max_candidates:
        raise ValueError(
            f"MG summary produced > max_candidates={max_candidates} "
            f"candidates at capacity={capacity}; raise max_candidates, "
            "or LOWER capacity (each partition emits up to `capacity` "
            "counter rows, so more capacity means MORE merged "
            "candidates, not fewer)"
        )
    if len(cands) >= k:
        kth_est = cands[k - 1][1]
        keep = [t for t, est in cands if est + err >= kth_est]
    else:
        keep = [t for t, _ in cands]
    if not keep:
        if err > 0:
            raise ValueError(
                f"exactness certificate failed: summary kept no candidates "
                f"but subtracted mass err={err} > 0 — retry with capacity "
                f"> {capacity}"
            )
        return top_tokens_exact(docs.limit(0), k, text_col=text_col, ngram=ngram)

    exploded = _units_df(docs, text_col, ngram).select(
        F.explode("_toks").alias("token")
    )
    if len(keep) <= _ISIN_LITERAL_CUTOFF:
        filtered = exploded.where(F.col("token").isin(keep))
    else:
        # a 200k-literal In expression bloats plan construction and
        # Catalyst optimization long before the max_candidates valve
        # raises — above the cutoff, semi-join against a broadcast
        # candidate frame instead (same rows, bounded plan size).
        spark = docs.sparkSession
        keep_df = spark.createDataFrame(
            [(t,) for t in keep], schema="token string"
        )
        filtered = exploded.join(F.broadcast(keep_df), "token", "left_semi")
    recount = (
        filtered.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )
    out = recount.collect()
    # certificate: a non-candidate token's true count is ≤ err.  With a
    # full k rows the k-th must beat err; with fewer than k rows the
    # candidate set must provably BE the whole vocabulary (err == 0).
    if (len(out) == k and out[-1].cnt <= err) or (len(out) < k and err > 0):
        kth = out[-1].cnt if out else 0
        raise ValueError(
            f"exactness certificate failed: k-th count {kth} <= subtracted "
            f"mass err={err}; a non-candidate token could outrank it — "
            f"retry with capacity > {capacity}"
        )
    spark = docs.sparkSession
    return spark.createDataFrame(out, schema="token string, cnt long")
