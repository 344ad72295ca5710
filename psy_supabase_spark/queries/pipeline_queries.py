"""Pipeline queries: multimodal plumbing + model-stub gates + the
WARC-boundary oracle gate.

``multimodal_features`` runs a REAL Arrow-batched ``mapInPandas`` over
binary payloads; the fake decode is a pure function of payload size, so
DuckDB reproduces it from octet_length — the UDF plumbing is what's under
test.  It ALSO absorbs the WARC/WET ingest boundary (sources/warc): each
document is rendered into a deterministic mini-shard (gzip member per
record, the Common Crawl layout — junk prefix + a malformed record with
no Content-Length + an HTTP response record + a WET conversion record)
and parsed back through the REAL production parser
(`warc.make_warc_parser` → `iter_gunzip_chunks` → `scan_warc_stream` →
`split_http_payload`); the oracle recomputes every evidence column from
the same grammar in pure SQL.  ``toxicity_gate`` mirrors the reference's
safety→toxicity routing with the portable-hash stub score.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ml_udfs, multimodal
from ..registry import register
from ..sources import warc
from ..sources.catalog import load_table

# WARC round-trip evidence grammar (mirrored EXACTLY in the oracle SQL):
# the HTML template rendered per doc, the WET payload length formula, and
# the WET-parse truncation valve.  The WET payload is pure ASCII so the
# SQL side can reproduce the truncated-byte md5 with repeat()/least().
_WARC_HTML_PREFIX = "<html><head><title>D"
_WARC_HTML_MID = "</title></head><body><p>"
_WARC_HTML_SUFFIX = "</p></body></html>"
_WET_VALVE = 96  # truncates WET payloads, whose length is 60 + doc_id % 80

_WARC_EVIDENCE_SCHEMA = (
    "doc_id bigint, warc_n_records bigint, warc_status int, "
    "warc_resp_md5 string, warc_resp_n_bytes bigint, warc_wet_trunc boolean, "
    "warc_wet_md5 string, warc_wet_n_bytes bigint"
)


def _warc_record(wtype: str, ctype: str, uri: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _doc_mini_shard(doc_id: int, text: str) -> bytes:
    """Deterministic per-doc shard segment, one gzip member per record
    (the Common Crawl layout): junk prefix + malformed record (no
    Content-Length — must resync, at any payload size) + HTTP response
    record carrying the templated HTML + WET conversion record whose
    ASCII payload length (60 + doc_id % 80) straddles the WET valve.
    Segments concatenate into one parseable shard (gzip members are
    self-delimiting), so a batch of docs parses in ONE pass.
    compresslevel=1: the gzip ROUND-TRIP is what's under test, not the
    compressor's effort setting (level 9 tripled the harness cost)."""
    html = f"{_WARC_HTML_PREFIX}{doc_id}{_WARC_HTML_MID}{text}{_WARC_HTML_SUFFIX}"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
    malformed = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad.example/\r\n\r\n"
    )
    rec_resp = _warc_record(
        "response",
        "application/http; msgtype=response",
        f"http://example.com/doc/{doc_id}",
        http,
    )
    rec_wet = _warc_record(
        "conversion", "text/plain", f"http://example.com/doc/{doc_id}",
        b"x" * (60 + doc_id % 80),
    )
    return (
        gzip.compress(b"\x00junk" + malformed, compresslevel=1)
        + gzip.compress(rec_resp, compresslevel=1)
        + gzip.compress(rec_wet, compresslevel=1)
    )


def warc_roundtrip_evidence(docs: DataFrame) -> DataFrame:
    """Render each document into a mini WARC shard and parse it back
    through the PRODUCTION parser twice — the response pass
    (strip_http_headers, 2 MiB valve) and the WET pass (conversion
    records, tiny valve exercising truncation) — emitting evidence
    columns a SQL oracle recomputes from the grammar: record counts
    (proves malformed-record resync), http_status (proves the HTTP
    split), payload md5s (prove gzip-member decompression + framing +
    strip byte-exactness), n_bytes (proves the post-strip length math)
    and the WET truncation flag + truncated-bytes md5 (prove the
    valve)."""
    parse_resp = warc.make_warc_parser(
        {"response"},
        max_payload_bytes=2 * 1024 * 1024,
        strip_http_headers=True,
        batch_records=4096,
    )
    parse_wet = warc.make_warc_parser(
        {"conversion"},
        max_payload_bytes=_WET_VALVE,
        strip_http_headers=False,
        batch_records=4096,
    )

    def _evidence(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            # ONE concatenated shard per Arrow batch (gzip members are
            # self-delimiting): a file per doc would make the parser's
            # per-file yield contract emit thousands of one-row frames —
            # measured 9 s of pandas concat overhead at sf0.1 — while one
            # shard parses in one pass and evidence maps back by
            # target_uri, which carries the doc_id
            shard = b"".join(
                _doc_mini_shard(d, t) for d, t in zip(ids, pdf["text"])
            )
            files = pd.DataFrame({"path": ["shard"], "content": [shard]})
            resp = pd.concat(list(parse_resp(iter([files]))), ignore_index=True)
            wet = pd.concat(list(parse_wet(iter([files]))), ignore_index=True)
            r_by: dict[str, list] = {}
            for uri, status, payload, n_b in zip(
                resp["target_uri"], resp["http_status"],
                resp["payload"], resp["n_bytes"],
            ):
                r_by.setdefault(uri, []).append((status, payload, n_b))
            w_by: dict[str, list] = {}
            for uri, trunc, payload, n_b in zip(
                wet["target_uri"], wet["truncated"],
                wet["payload"], wet["n_bytes"],
            ):
                w_by.setdefault(uri, []).append((trunc, payload, n_b))
            out = {k: [] for k in (
                "doc_id", "warc_n_records", "warc_status", "warc_resp_md5",
                "warc_resp_n_bytes", "warc_wet_trunc", "warc_wet_md5",
                "warc_wet_n_bytes",
            )}
            for did in ids:
                uri = f"http://example.com/doc/{did}"
                r = r_by.get(uri)
                w = w_by.get(uri)
                out["doc_id"].append(did)
                out["warc_n_records"].append(
                    (0 if r is None else len(r)) + (0 if w is None else len(w))
                )
                r1 = r[0] if r is not None and len(r) == 1 else None
                w1 = w[0] if w is not None and len(w) == 1 else None
                out["warc_status"].append(None if r1 is None else r1[0])
                out["warc_resp_md5"].append(
                    None if r1 is None else hashlib.md5(r1[1]).hexdigest()
                )
                out["warc_resp_n_bytes"].append(
                    None if r1 is None else int(r1[2])
                )
                out["warc_wet_trunc"].append(None if w1 is None else bool(w1[0]))
                out["warc_wet_md5"].append(
                    None if w1 is None else hashlib.md5(w1[1]).hexdigest()
                )
                out["warc_wet_n_bytes"].append(None if w1 is None else int(w1[2]))
            res = pd.DataFrame(out)
            res["warc_status"] = res["warc_status"].astype("Int32")
            yield res

    return docs.select("doc_id", "text").mapInPandas(
        _evidence, _WARC_EVIDENCE_SCHEMA
    )


@register(
    "multimodal_features",
    oracle=f"""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    f AS (
      SELECT doc_id, n,
             CAST(ceil(n::DOUBLE / {multimodal.FRAME_SIZE}) AS BIGINT) AS n_frames
      FROM b
    ),
    w AS (
      SELECT doc_id,
             '{_WARC_HTML_PREFIX}' || CAST(doc_id AS VARCHAR) || '{_WARC_HTML_MID}'
               || text || '{_WARC_HTML_SUFFIX}' AS html,
             60 + doc_id % 80 AS wet_len
      FROM documents
    )
    SELECT f.doc_id,
           n AS n_bytes,
           (n % 640) + 1 AS fake_width,
           ((n * 7) % 480) + 1 AS fake_height,
           n_frames,
           CAST(floor((n_frames + {multimodal.FRAME_STRIDE - 1}) / {multimodal.FRAME_STRIDE}) AS BIGINT) AS n_sampled,
           COALESCE(list_sum(list_transform(range(n_frames),
             i -> CASE WHEN i % {multimodal.FRAME_STRIDE} = 0
                       THEN least({multimodal.FRAME_SIZE}, n - {multimodal.FRAME_SIZE} * i)
                       ELSE 0 END)), 0)::BIGINT AS sampled_len_sum,
           least(n, {multimodal.RESIZE_W * multimodal.RESIZE_H}) AS resized_n_bytes,
           CAST(2 AS BIGINT) AS warc_n_records,
           CAST(200 AS INTEGER) AS warc_status,
           md5(w.html) AS warc_resp_md5,
           CAST(octet_length(encode(w.html)) AS BIGINT) AS warc_resp_n_bytes,
           w.wet_len > {_WET_VALVE} AS warc_wet_trunc,
           md5(repeat('x', least(w.wet_len, {_WET_VALVE}))) AS warc_wet_md5,
           CAST(w.wet_len AS BIGINT) AS warc_wet_n_bytes
    FROM f JOIN w ON f.doc_id = w.doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas PLUS the WARC
    ingest boundary's oracle evidence (see `warc_roundtrip_evidence`).

    Column → operator → localizing pytest TRIAGE MAP (a hash mismatch
    names its operator here):

    | column              | operator under test                   | pytest localizer                         |
    |---------------------|---------------------------------------|------------------------------------------|
    | n_bytes..resized_*  | multimodal.extract_blob_features      | tests/test_multimodal.py                 |
    | warc_n_records      | scan_warc_stream malformed resync     | test_warc.py::test_malformed_record_resyncs |
    | warc_status         | warc.split_http_payload               | test_warc.py::test_iter_records_and_http_split |
    | warc_resp_md5       | iter_gunzip_chunks + framing + strip  | test_warc.py::test_iter_gunzip_chunks_incremental |
    | warc_resp_n_bytes   | post-strip body length math           | test_warc.py::test_http_valve_applies_to_body_not_envelope |
    | warc_wet_trunc      | payload valve (truncated flag)        | test_warc.py::test_read_warc_end_to_end  |
    | warc_wet_md5        | valve byte-exact truncation           | test_warc.py::test_scan_stream_valve_drains_oversized_payload |
    | warc_wet_n_bytes    | pre-truncation length (clen)          | test_warc.py::test_read_warc_end_to_end  |
    """
    docs = load_table(spark, sf_dir, "documents")
    features = multimodal.extract_blob_features(multimodal.attach_blobs(docs))
    evidence = warc_roundtrip_evidence(docs)
    return features.join(evidence, "doc_id")


@register(
    "toxicity_gate",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             ROUND((CAST(('0x' || substr(md5(lower(text)), 1, 8)) AS BIGINT) % 1000)::DOUBLE / 1000.0,
                   6) AS tox_score,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS n_words
      FROM documents
    )
    SELECT doc_id, tox_score,
           CASE WHEN n_words < 5 THEN FALSE ELSE tox_score > 0.7 END AS toxic
    FROM scored
    """,
)
def toxicity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 parity: toxicity gate with the <5-words short-circuit (reference
    text_generator.py:273-275, 294); deterministic stub score."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ml_udfs.toxicity_score("text").alias("tox_score"),
        ml_udfs.is_toxic("text").alias("toxic"),
    )


@register(
    "embed_documents_stub",
    oracle="SELECT doc_id, CAST(64 AS BIGINT) AS dim, CAST(1.0 AS DOUBLE) AS norm FROM documents",
)
def embed_documents_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: batch embedding generation through the real pandas-UDF path
    (deterministic hash-stub model).  The RNG values aren't SQL, but the
    CONTRACT is: every embedding has dim 64 and unit norm — the oracle
    asserts exactly that, so a broken UDF (nan, wrong dim, missing rows)
    fails the gate."""
    from ..functions import vector as V

    docs = load_table(spark, sf_dir, "documents")
    embed = ml_udfs.hash_embedding_udf(64)
    out = docs.select("doc_id", embed(F.col("text")).alias("embedding"))
    return out.select(
        "doc_id", F.size("embedding").cast("bigint").alias("dim"), F.round(V.l2_norm("embedding"), 3).alias("norm")
    )
