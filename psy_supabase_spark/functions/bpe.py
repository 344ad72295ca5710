"""Byte-pair-encoding tokenizer: distributed training pass, Arrow-batched apply.

Why it exists: `pack_sequences` (operators/textanalysis.py) packs chunks into
fixed token budgets.  A whitespace token count (functions/text.token_count)
is a fine proxy, but a model-training pipeline needs the budget in the
MODEL's tokens — and BPE (Sennrich et al. 2016, the GPT-2 tokenizer family)
is the standard.  No tokenizer library ships in this container, so the
algorithm is implemented from scratch (it is public and small).

Scale split — the part that touches the corpus is distributed, the part
that is sequential is vocabulary-sized:

- **Word-frequency pass** (the only corpus-sized stage): pre-tokenize with
  a GPT-2-style regex inside codegen (`regexp_extract_all`), explode,
  groupBy-count.  Partial aggregation map-side; output is |unique words|,
  millions of rows at 100 TB — collected as (word, count) after an optional
  frequency floor, NOT the corpus.
- **Merge loop** (inherently sequential — each merge depends on the last):
  runs driver-side over the word-frequency table with an incrementally
  maintained pair-count index, O(merges x touched words), independent of
  corpus size.
- **Encode** (corpus-sized again): pandas UDF; merge ranks broadcast in the
  closure; per-batch word memoization (Zipf: a batch re-encodes few
  distinct words).

Char-level symbols (not byte-level) — ASCII testdata makes them equivalent;
the byte-level variant only swaps the initial alphabet.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer, spelled in RE2 (Spark codegen) AND Python `re`
# compatible syntax: contractions, space-prefixed words/numbers/punctuation
# runs, whitespace runs.  No lookahead, so the two engines split identically.
PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def pretokenize(text_col: str | Column) -> Column:
    """Array of pre-tokens (codegen'd; the distributed side of training)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(c, F.lit(PRETOKEN_RE), 0)


# The driver-collect hard ceiling: 5M (word, count) tuples ≈ low hundreds
# of MB on the driver — far above any sane BPE working set, far below the
# 10⁸–10⁹ distinct pre-tokens of a web-scale corpus.
MAX_COLLECTED_VOCAB = 5_000_000


def word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 1,
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, int]]:
    """The corpus-sized stage: distinct pre-token counts, collected.

    Everything before the collect is map-side partial aggregation; the
    collect itself is the scale hazard — a web corpus has 10⁸–10⁹ distinct
    pre-tokens, a driver OOM.  Two valves:

    - ``max_vocab`` (default 1M): keep only the most frequent N words
      (ties broken lexicographically — deterministic), fetched with a
      distributed sort+limit so the driver never sees more than N rows.
      Rare words BPE would never merge anyway (merge picks max-count
      pairs), so a generous top-N changes nothing but the tail of the
      alphabet inventory.
    - ``max_vocab=None`` (explicit opt-out) still refuses to collect more
      than :data:`MAX_COLLECTED_VOCAB` rows — it counts first and raises
      with guidance instead of OOMing the driver.
    """
    freq = (
        docs.select(F.explode(pretokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    if max_vocab is not None:
        rows = freq.orderBy(F.col("n").desc(), F.col("w")).limit(max_vocab).collect()
    else:
        n_vocab = freq.count()
        if n_vocab > MAX_COLLECTED_VOCAB:
            raise ValueError(
                f"word_frequencies would collect {n_vocab:,} distinct pre-tokens "
                f"(> {MAX_COLLECTED_VOCAB:,}) onto the driver. Raise min_count "
                f"(currently {min_count}) or set max_vocab to a top-N bound "
                "instead of max_vocab=None."
            )
        rows = freq.collect()
    return [(r.w, r.n) for r in rows]


def train_merges(word_freq: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop with an incrementally maintained pair index.

    Deterministic: ties on pair count break lexicographically, so the same
    corpus always yields the same merge table (engine-portable, like every
    other constant in this repo).
    """
    words: list[tuple[list[str], int]] = [(list(w), n) for w, n in word_freq if len(w) > 1]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _index(i: int, sign: int) -> None:
        syms, n = words[i]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * n
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(i)

    for i in range(len(words)):
        _index(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        live = {p: c for p, c in pair_counts.items() if c > 0}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            _index(i, -1)  # retract this word's old pairs
            syms, n = words[i]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, n)
            _index(i, +1)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 200,
    min_count: int = 1,
    max_vocab: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Distributed word counts -> sequential merge loop.  Returns the merge
    table (the entire trained state of a BPE tokenizer)."""
    return train_merges(
        word_frequencies(docs, text_col, min_count=min_count, max_vocab=max_vocab), n_merges
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    syms = list(word)
    while len(syms) > 1:
        pairs = [(ranks.get((a, b)), k) for k, (a, b) in enumerate(zip(syms, syms[1:]))]
        ranked = [(r, k) for r, k in pairs if r is not None]
        if not ranked:
            break
        _, k = min(ranked)
        syms[k : k + 2] = [syms[k] + syms[k + 1]]
    return syms


def bpe_tokens_udf(merges: list[tuple[str, str]]) -> Column:
    """Factory for an `array<string>` pandas-UDF column of BPE tokens.

    The merge table rides the closure (broadcast once per executor); each
    Arrow batch memoizes word -> tokens, so cost tracks DISTINCT words per
    batch, not total words.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    pre = re.compile(PRETOKEN_RE)

    @F.pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(text: str | None) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in pre.findall(text):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return s.map(one)

    return _tok


def bpe_token_count(text_col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """Model-exact token count column — drop-in for text.token_count as the
    `tokens_col` fed to operators/textanalysis.pack_sequences."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(bpe_tokens_udf(merges)(c)).cast("long")
