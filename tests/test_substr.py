"""ExactSubstr span dedup (operators/substr): brute-force reference
parity, keep-one semantics, interval merge, excision rebuild, and the
no-Python plan check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.operators import substr


def _brute(docs: dict[int, str], L: int, keep_first: bool = True):
    """Reference implementation: duplicated L-windows -> canonical-kept ->
    merged per-doc intervals -> excised text."""
    toks = {i: t.split() for i, t in docs.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for i, ts in sorted(toks.items()):
        for p in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[p : p + L]), []).append((i, p))
    dup_pos: dict[int, set[int]] = {i: set() for i in docs}
    for g, places in occ.items():
        if len(places) < 2:
            continue
        first = min(places)
        for i, p in places:
            if keep_first and (i, p) == first:
                continue
            dup_pos[i].add(p)
    spans = {}
    out = {}
    removed = {}
    for i, ts in toks.items():
        ps = sorted(dup_pos[i])
        ivals = []
        for p in ps:
            if ivals and p <= ivals[-1][1]:
                ivals[-1] = (ivals[-1][0], max(ivals[-1][1], p + L))
            else:
                ivals.append((p, p + L))
        # merge adjacency like the operator (p2 <= p1 + L)
        spans[i] = ivals
        covered = set()
        for s, e in ivals:
            covered.update(range(s, e))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[i] = " ".join(kept)
        removed[i] = len(ts) - len(kept)
    return spans, out, removed


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _sentence(seed: int, n: int) -> str:
    # position-unique tokens — no accidental internal periodicity (a
    # cycling generator repeats every lcm(cycles) tokens and plants
    # real duplicated windows in a "clean" doc)
    return " ".join(
        WORDS[(seed * 7 + k) % len(WORDS)] + f"s{seed}k{k}" for k in range(n)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "this license text is repeated verbatim across many documents " * 2  # 20 tokens
    docs = {
        0: _sentence(1, 30) + " " + boiler + _sentence(2, 25),
        1: _sentence(3, 40) + " " + boiler + _sentence(4, 10),
        2: _sentence(5, 60),                           # clean
        3: boiler + _sentence(6, 5) + " " + boiler,    # two copies in one doc
        4: _sentence(1, 30),                           # prefix-shares doc 0's opening
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return docs, df


L = 12


def test_spans_match_bruteforce(spark, corpus):
    docs, df = corpus
    want_spans, _, _ = _brute(docs, L)
    got = {}
    for r in substr.duplicated_spans(df, L).collect():
        got.setdefault(r["id"], []).append((r["start"], r["end"]))
    got = {k: sorted(v) for k, v in got.items()}
    want = {k: v for k, v in want_spans.items() if v}
    assert got == want


def test_excision_matches_bruteforce(spark, corpus):
    docs, df = corpus
    _, want_text, want_removed = _brute(docs, L)
    out = {
        r["doc_id"]: (r["text"], r["n_removed_tokens"])
        for r in substr.excise_duplicate_spans(df, L).collect()
    }
    for i in docs:
        assert out[i] == (want_text[i], want_removed[i]), i


def test_keep_first_leaves_one_copy(spark, corpus):
    docs, df = corpus
    out = {r["doc_id"]: r["text"] for r in substr.excise_duplicate_spans(df, L).collect()}
    boiler = "this license text is repeated verbatim across many documents"
    survivors = sum(boiler in t for t in out.values())
    assert survivors == 1  # exactly one copy of the span survives corpus-wide
    assert boiler in out[0]  # the canonical (lowest id, pos) occurrence


def test_keep_first_false_removes_all(spark, corpus):
    docs, df = corpus
    out = {
        r["doc_id"]: r["text"]
        for r in substr.excise_duplicate_spans(df, L, keep_first=False).collect()
    }
    boiler = "this license text is repeated verbatim"
    assert not any(boiler in t for t in out.values())
    # and parity with the brute force in that mode too
    _, want_text, _ = _brute(docs, L, keep_first=False)
    for i in docs:
        assert out[i] == want_text[i]


def test_clean_doc_passes_through_whitespace_normalized(spark, corpus):
    docs, df = corpus
    out = {r["doc_id"]: r for r in substr.excise_duplicate_spans(df, L).collect()}
    assert out[2]["text"] == docs[2] and out[2]["n_removed_tokens"] == 0


def test_short_docs_and_empty(spark):
    df = spark.createDataFrame(
        [(0, "tiny doc"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in substr.excise_duplicate_spans(df, L).collect()}
    assert out[0]["text"] == "tiny doc" and out[1]["text"] == "" and out[2]["text"] == ""


def test_excision_plan_has_no_python(spark, corpus):
    _, df = corpus
    plan = (
        substr.excise_duplicate_spans(df, L)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "InPandas" not in plan


def test_property_random_corpora_match_bruteforce(spark):
    """Hypothesis fuzz: random tiny-vocab corpora (duplication-dense by
    construction) — operator excision must equal the reference on every
    example, both keep modes."""
    from hypothesis import given, settings, strategies as st

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=0, max_size=25).map(" ".join)
    corpus_strat = st.lists(doc, min_size=1, max_size=6)

    @settings(max_examples=5, deadline=None)
    @given(corpus_strat, st.booleans())
    def check(texts, keep_first):
        docs = {i: t for i, t in enumerate(texts)}
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        _, want_text, want_removed = _brute(docs, 4, keep_first=keep_first)
        out = {
            r["doc_id"]: (r["text"], r["n_removed_tokens"])
            for r in substr.excise_duplicate_spans(df, 4, keep_first=keep_first).collect()
        }
        for i in docs:
            # brute force normalizes whitespace the same way (split/join)
            assert out[i] == (want_text[i], want_removed[i]), (i, docs[i])

    check()
