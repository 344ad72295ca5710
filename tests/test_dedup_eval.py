"""Dedup-strategy floors on the planted-modes benchmark
(tools/dedup_eval): each strategy must keep owning its modality."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def results(spark):
    from dedup_eval import evaluate

    return evaluate(spark, "/root/testdata/sf0.01", 120)


def test_exact_modality(results):
    assert results["exact_dedup"]["recall_exact"] == 1.0
    for s in ("ngram_jaccard", "minhash_lsh", "simhash", "winnow"):
        assert results[s]["recall_exact"] == 1.0, s


def test_near_modality(results):
    # the 5%-edit band belongs to the Jaccard family; precision must not
    # be bought with junk pairs
    for s in ("ngram_jaccard", "minhash_lsh"):
        assert results[s]["recall_near"] >= 0.9, s
        assert results[s]["precision"] == 1.0, s


def test_partial_modality(results):
    # partial/substring overlap is EXACTLY what the Jaccard family
    # misses and winnow/ExactSubstr exist for
    assert results["ngram_jaccard"]["recall_partial"] <= 0.2
    assert results["winnow"]["recall_partial"] >= 0.8
    assert results["exact_substr"]["recall_partial"] >= 0.8


def test_winnow_is_a_candidate_generator(results):
    # winnow trades precision for overlap coverage by design — its pairs
    # feed a verify stage; a silent precision jump would mean the corpus
    # or config changed under us
    assert results["winnow"]["precision"] < 0.5
