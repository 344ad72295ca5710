"""Winnowing fingerprints: numpy sketch == pure-Python spec twin, the
paper's shared-substring guarantee, and partial-overlap pair detection
(the case whole-text hashing and bag-of-grams Jaccard both miss)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from psy_supabase_spark.operators import winnow


def _spark_fps(spark, texts, k=8, w=4):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = winnow.winnow_fingerprints(df, k=k, w=w).collect()
    return {r.doc_id: list(r.fingerprints) for r in rows}


def test_numpy_sketch_matches_spec_twin(spark):
    rng = random.Random(3)
    texts = [
        "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))
        for n in (0, 3, 7, 8, 9, 11, 40, 200)
    ] + ["aaaaaaaaaaaaaaaaa", "abcabcabcabcabcabc"]
    got = _spark_fps(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == winnow.winnow_fingerprints_py(t), (i, t)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=string.printable, max_size=120))
def test_spec_twin_is_total_and_deduped(t):
    fps = winnow.winnow_fingerprints_py(t)
    assert len(fps) == len(set(fps))
    if len(t) >= 8 + 4 - 1:
        assert len(fps) >= 1  # at least one window → at least one pick


def test_shared_substring_guarantee():
    # the paper's guarantee: a shared substring of length >= w+k-1 yields
    # at least one shared fingerprint
    rng = random.Random(9)
    core = "the exact same copied paragraph lives inside both documents"
    a = "".join(rng.choice(string.ascii_lowercase) for _ in range(50)) + core
    b = core + "".join(rng.choice(string.ascii_lowercase) for _ in range(50))
    fa = set(winnow.winnow_fingerprints_py(a))
    fb = set(winnow.winnow_fingerprints_py(b))
    assert fa & fb


def test_winnow_pairs_catch_partial_overlap(spark):
    # doc 0 and doc 1 share one copied sentence inside otherwise-different
    # text; doc 2 is unrelated.  Bag-of-word-3-gram Jaccard at 0.5 misses
    # this (overlap ratio is low); winnowing must pair (0, 1) only.
    copied = "this copied sentence appears verbatim in two different documents"
    texts = [
        "completely original opening text here. " + copied,
        copied + " followed by an entirely different continuation of words",
        "nothing in this third document matches anything else at all",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow.winnow_neardup_pairs(df, min_shared=2).collect()
    }
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)


def test_df_cap_drops_boilerplate_fingerprints(spark):
    # 200 docs sharing one boilerplate sentence → its fingerprints occur in
    # all docs; with df_cap below that the boilerplate can't pair anything
    boiler = "standard legal disclaimer footer text common to every single document"
    # structurally disjoint prefixes (each doc repeats its own 2-letter
    # pattern) so the ONLY cross-doc substrings come from the boilerplate
    texts = [
        (chr(97 + i // 26) + chr(97 + i % 26)) * 30 + " " + boiler
        for i in range(200)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    # uncapped, every pair shares the boilerplate's many fingerprints;
    # capped, only the 1-2 junction grams survive — no pair reaches 5
    uncapped = winnow.winnow_neardup_pairs(df, min_shared=5, df_cap=None)
    assert uncapped.count() == 200 * 199 // 2
    capped = winnow.winnow_neardup_pairs(df, min_shared=5, df_cap=50)
    assert capped.count() == 0
