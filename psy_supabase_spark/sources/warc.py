"""WARC (ISO 28500) ingest — the Common Crawl boundary.

Web-corpus pipelines start from WARC shards (C4, RefinedWeb, FineWeb all
begin at Common Crawl's ``.warc.gz`` / WET files); this module is where
those bytes become rows for the engine's HTML→text→quality→dedup chain
(`functions/html`, `queries/training_pipeline`).  Pure public knowledge:
the WARC record grammar is ISO 28500 (version line, CRLF header block,
``Content-Length``-framed payload, CRLF CRLF trailer), and Common
Crawl's layout is one gzip MEMBER per record concatenated into ~1 GB
shards.

Spark mapping (the part that matters at 100 TB):

- **`binaryFile` rows, one task per shard.**  ``spark.read.format
  ("binaryFile")`` lists shards as (path, content) rows and never splits
  a file — exactly right for WARC, whose gzip framing is not
  block-splittable; parallelism comes from the shard count (Common
  Crawl publishes ~64k shards per crawl), which dwarfs any cluster.
- **Record scan is a mapInPandas generator** emitting one bounded batch
  per shard: executors hold one decompressed shard, the driver never
  sees payloads, and the output columns are exactly what downstream
  filters push on (``warc_type``, ``content_type``, ``http_status``).
- **Payload width is valved** (``max_payload_bytes``, default 2 MiB —
  the C4 cut): the stored payload truncates, ``n_bytes`` keeps the true
  length and ``truncated`` marks the cut, so oversized responses can't
  blow row width; filter them or re-fetch as policy dictates.
- **Malformed records resync, never fail the shard**: a record whose
  framing is broken is skipped by scanning forward to the next
  ``WARC/`` magic — crawl data always contains a few, and one bad
  record must not cost a 1 GB shard.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GZIP_MAGIC = b"\x1f\x8b"

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "payload binary, n_bytes bigint, truncated boolean"
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of CONCATENATED gzip members (the Common
    Crawl record-per-member layout) into one byte string.  A plain
    ``gzip.decompress`` stops at the first member on some malformed
    tails; this loop consumes members until the stream is exhausted or
    undecodable (returning what decoded — resilience over raising,
    matching the malformed-record policy)."""
    chunks: list[bytes] = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunks.append(d.decompress(data))
            chunks.append(d.flush())
        except zlib.error:
            break
        if d.unused_data == data:  # no progress — corrupt tail
            break
        data = d.unused_data
    return b"".join(chunks)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """(header-fields, payload) per record, ISO 28500 framing: a
    ``WARC/x.y`` version line, CRLF-separated ``Name: value`` headers,
    blank line, ``Content-Length`` payload bytes.  Header names fold to
    lowercase.  Broken framing resyncs to the next ``WARC/`` magic."""
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos) or data.startswith(b"\n", pos):
            pos += 2 if data.startswith(b"\r\n", pos) else 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos + 1)
            if nxt == -1:
                return
            pos = nxt
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            return
        fields: dict[str, str] = {}
        header = data[pos:hdr_end].decode("utf-8", "replace")
        for line in header.split("\r\n")[1:]:
            name, sep, value = line.partition(":")
            if sep:
                fields[name.strip().lower()] = value.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            clen = -1
        body_start = hdr_end + 4
        if clen < 0 or body_start + clen > n:
            # malformed framing: resync to the next record magic
            nxt = data.find(b"WARC/", body_start)
            if nxt == -1:
                return
            pos = nxt
            continue
        yield fields, data[body_start : body_start + clen]
        pos = body_start + clen


def split_http_payload(payload: bytes) -> tuple[int | None, bytes]:
    """(status, body) of an ``application/http`` record payload: parse
    the status code off the first line, drop the HTTP header block.
    Records without an HTTP header block come back (None, payload)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep or not head.startswith(b"HTTP/"):
        return None, payload
    try:
        status = int(head.split(b"\r\n", 1)[0].split()[1])
    except (IndexError, ValueError):
        status = None
    return status, body


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    max_payload_bytes: int = 2 * 1024 * 1024,
) -> DataFrame:
    """WET shards → (target_uri, warc_date, text, n_bytes, truncated):
    Common Crawl's extracted-text sibling of WARC — same ISO 28500
    framing, ``conversion`` records whose payload is already plain
    UTF-8 text (no HTTP envelope).  A thin view over :func:`read_warc`
    that decodes the payload; pipelines that start from WET skip the
    `html_to_text` stage and go straight to quality/lang gates."""
    from pyspark.sql import functions as F

    return (
        read_warc(
            spark,
            path,
            record_types=("conversion",),
            max_payload_bytes=max_payload_bytes,
            strip_http_headers=False,
        )
        .select(
            "target_uri",
            "warc_date",
            F.col("payload").cast("string").alias("text"),
            "n_bytes",
            "truncated",
        )
    )


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    max_payload_bytes: int = 2 * 1024 * 1024,
    strip_http_headers: bool = True,
) -> DataFrame:
    """WARC shards → rows: (path, record_id, warc_type, target_uri,
    warc_date, content_type, http_status, payload, n_bytes, truncated).

    ``record_types`` filters at parse time (("response",) is the HTML
    harvest; add "warcinfo"/"request"/"metadata"/"conversion" — the last
    is WET's extracted-text type — as needed; empty tuple = keep all).
    ``strip_http_headers`` splits ``application/http`` payloads and
    stores only the body (status lands in ``http_status``).  ``n_bytes``
    is the pre-truncation payload length; compose with
    `functions.html.html_to_text` for the WET-style extraction chain."""
    keep = {t.lower() for t in record_types}
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "path": [], "record_id": [], "warc_type": [],
                "target_uri": [], "warc_date": [], "content_type": [],
                "http_status": [], "payload": [], "n_bytes": [],
                "truncated": [],
            }
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if data[:2] == GZIP_MAGIC:
                    data = gunzip_members(data)
                for fields, payload in iter_warc_records(data):
                    wtype = fields.get("warc-type", "").lower()
                    if keep and wtype not in keep:
                        continue
                    status = None
                    ctype = fields.get("content-type", "")
                    if strip_http_headers and ctype.startswith("application/http"):
                        status, payload = split_http_payload(payload)
                    n_bytes = len(payload)
                    truncated = n_bytes > max_payload_bytes
                    if truncated:
                        payload = payload[:max_payload_bytes]
                    out["path"].append(fpath)
                    out["record_id"].append(fields.get("warc-record-id", ""))
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(fields.get("warc-target-uri", ""))
                    out["warc_date"].append(fields.get("warc-date", ""))
                    out["content_type"].append(ctype)
                    out["http_status"].append(status)
                    out["payload"].append(payload)
                    out["n_bytes"].append(n_bytes)
                    out["truncated"].append(truncated)
            if out["path"]:
                pdf_out = pd.DataFrame(out)
                pdf_out["http_status"] = pdf_out["http_status"].astype("Int32")
                yield pdf_out

    return files.mapInPandas(parse, schema=WARC_SCHEMA)
