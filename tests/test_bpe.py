"""BPE tokenizer: incremental-index training vs brute-force twin, lossless
encoding, distributed word counts vs local Counter, packing composition."""

from __future__ import annotations

import pytest
import random
import re
from collections import Counter

from pyspark.sql import functions as F

from psy_supabase_spark.functions import bpe
from psy_supabase_spark.operators.textanalysis import pack_sequences
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def brute_train(word_freq, n_merges):
    """Recount every pair from scratch each iteration — the O(V) per-merge
    spec the incremental index must match exactly."""
    words = [(list(w), n) for w, n in word_freq if len(w) > 1]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, n in words:
            for p in zip(syms, syms[1:]):
                counts[p] += n
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        for i, (syms, n) in enumerate(words):
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, n)
    return merges


def test_incremental_training_equals_bruteforce():
    rng = random.Random(7)
    for trial in range(20):
        vocab = ["".join(rng.choices("abcde", k=rng.randint(1, 8))) for _ in range(30)]
        freq = [(w, rng.randint(1, 9)) for w in set(vocab)]
        assert bpe.train_merges(freq, 25) == brute_train(freq, 25)


def test_training_is_deterministic():
    freq = [("lowlow", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    assert bpe.train_merges(freq, 10) == bpe.train_merges(freq, 10)


def test_encode_is_lossless_and_monotone():
    corpus = "the fast query engine sorts the fast table the fast query"
    freq = list(Counter(re.findall(bpe.PRETOKEN_RE, corpus)).items())
    merges = bpe.train_merges(freq, 50)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in [" fast", " query", "the", " engine"]:
        toks = bpe._encode_word(w, ranks)
        assert "".join(toks) == w  # lossless
        assert len(toks) <= len(w)  # never more tokens than chars
    assert bpe._encode_word(" fast", {}) == list(" fast")  # 0 merges = chars
    # a frequent word ends fully merged into one token
    assert bpe._encode_word(" fast", ranks) == [" fast"]


def test_word_frequencies_match_local_counter(spark):
    docs = load_table(spark, SF, "documents")
    dist = dict(bpe.word_frequencies(docs, "text"))
    local = Counter()
    for r in docs.select("text").collect():
        local.update(re.findall(bpe.PRETOKEN_RE, r.text))
    assert dist == dict(local)


def test_udf_tokens_match_driver_encoding(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    merges = bpe.train_bpe(docs, "text", n_merges=80)
    ranks = {p: i for i, p in enumerate(merges)}
    got = docs.select("doc_id", bpe.bpe_tokens_udf(merges)("text").alias("toks")).collect()
    pre = re.compile(bpe.PRETOKEN_RE)
    for r in docs.select("doc_id", "text").collect():
        want = [t for w in pre.findall(r.text) for t in bpe._encode_word(w, ranks)]
        have = next(list(g.toks) for g in got if g.doc_id == r.doc_id)
        assert have == want


def test_bpe_budget_packing_composes(spark):
    docs = load_table(spark, SF, "documents").limit(40)
    merges = bpe.train_bpe(docs, "text", n_merges=60)
    chunks = docs.select(
        F.lit(0).alias("corpus"),
        F.col("doc_id"),
        F.lit(0).alias("chunk_idx"),
        bpe.bpe_token_count("text", merges).alias("n_tokens"),
    )
    budget = 128
    packed = pack_sequences(chunks, budget=budget, group_col="corpus", tokens_col="n_tokens")
    per_seq = (
        packed.groupBy("seq_id")
        .agg(F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # every multi-chunk sequence respects the model-token budget
    assert all(r.tot <= budget for r in per_seq if r.n > 1)
    assert packed.count() == 40


def test_word_frequencies_top_n_cap_is_deterministic(spark):
    rows = [(1, "aa bb aa cc aa bb dd ee ff gg")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = bpe.word_frequencies(docs, max_vocab=3)
    assert len(top) == 3
    assert top[0][0] == " aa" or top[0][0] == "aa"  # most frequent first


def test_word_frequencies_opt_out_guard_raises_with_guidance(spark, monkeypatch):
    monkeypatch.setattr(bpe, "MAX_COLLECTED_VOCAB", 3)
    rows = [(1, "one two three four five six seven")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count|max_vocab"):
        bpe.word_frequencies(docs, max_vocab=None)


def test_train_bpe_capped_vocab_matches_uncapped_on_small_corpus(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = bpe.train_bpe(docs, n_merges=20, max_vocab=1000)
    uncapped = bpe.train_bpe(docs, n_merges=20, max_vocab=None)
    assert capped == uncapped  # cap far above vocab → identical merges
