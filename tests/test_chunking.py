"""Document chunking: overlapping token windows vs a Python reference."""

from __future__ import annotations

import math

import pytest

from psy_supabase_spark.operators import textanalysis
from psy_supabase_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _ref_chunks(text: str, chunk_tokens: int = 64, overlap: int = 16):
    toks = text.split()
    n = len(toks)
    stride = chunk_tokens - overlap
    n_windows = max(math.ceil((n - overlap) / stride), 1)
    out = []
    for i in range(n_windows):
        s = i * stride
        out.append((i, min(chunk_tokens, n - s), " ".join(toks[s : s + chunk_tokens])))
    return [(i, k, c) for i, k, c in out if k > 0]


@pytest.mark.parametrize(
    "n_tokens", [0, 1, 15, 16, 17, 63, 64, 65, 80, 112, 113, 200]
)
def test_chunking_matches_reference(spark, n_tokens):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.chunk_idx, r.n_chunk_tokens, r.chunk)
        for r in textanalysis.chunk_documents(df).orderBy("chunk_idx").collect()
    ]
    assert got == _ref_chunks(text)


def test_chunking_full_coverage_and_overlap(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    chunks = textanalysis.chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        toks = originals[doc_id].split()
        # stitching chunks with the overlap removed reproduces the document
        stitched = rs[0].chunk.split()
        for r in rs[1:]:
            stitched.extend(r.chunk.split()[8:] if r.chunk_idx > 0 else r.chunk.split())
        # every token covered exactly (last window may re-cover the tail)
        assert stitched[: len(toks)] == toks or " ".join(toks) == " ".join(stitched)


def test_chunking_rejects_bad_overlap(spark):
    docs = load_table(spark, SF, "documents").limit(1)
    with pytest.raises(ValueError):
        textanalysis.chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_pack_sequences_budget_and_order(spark):
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").limit(40).withColumn(
        "group_key", F.col("doc_id") % 4
    )
    chunks = textanalysis.chunk_documents(docs, chunk_tokens=32, overlap=8).join(
        docs.select("doc_id", "group_key"), "doc_id"
    )
    packed = textanalysis.pack_sequences(
        chunks, budget=100, group_col="group_key"
    ).collect()

    by_group: dict[int, list] = {}
    for r in packed:
        by_group.setdefault(r.group_key, []).append(r)
    for g, rows in by_group.items():
        rows.sort(key=lambda r: (r.doc_id, r.chunk_idx))
        # reproduce greedy packing in Python
        seq, used, want = 0, 0, []
        for r in rows:
            if used > 0 and used + r.n_chunk_tokens > 100:
                seq, used = seq + 1, 0
            used += r.n_chunk_tokens
            want.append(seq)
        assert [r.seq_id for r in rows] == want
        # budget respected except single-oversized-chunk sequences
        totals: dict[int, int] = {}
        counts: dict[int, int] = {}
        for r in rows:
            totals[r.seq_id] = totals.get(r.seq_id, 0) + r.n_chunk_tokens
            counts[r.seq_id] = counts.get(r.seq_id, 0) + 1
        for s, tot in totals.items():
            assert tot <= 100 or counts[s] == 1
