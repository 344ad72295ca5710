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
- **Record scan is an incremental pipeline** — gzip members decompress
  in bounded chunks (`iter_gunzip_chunks`) feeding a streaming record
  scanner (`scan_warc_stream`); the decompressed shard is NEVER
  materialized.
- **Peak-memory contract** (per task): the compressed shard bytes (one
  `binaryFile` row — unavoidable under that source) + one in-flight
  decompression chunk + one record head (header block capped at 64 KiB
  + min(Content-Length, valve) stored payload) + one output frame
  (≤ ``batch_records`` rows, each payload ≤ the valve).  Payload bytes
  beyond the valve are drained in bounded windows and dropped, so a
  pathological 4 GB record costs O(valve), not O(record).
- **Output frames are per-file and bounded**: `binaryFile` packs many
  small shards into one partition under ``maxPartitionBytes``, so the
  parser yields at file boundaries AND every ``batch_records`` records
  within a file — never one frame per Arrow batch of shards.
- **Payload width is valved** (``max_payload_bytes``, default 2 MiB —
  the C4 cut): the stored payload truncates, ``n_bytes`` keeps the true
  length and ``truncated`` marks the cut, so oversized responses can't
  blow row width; filter them or re-fetch as policy dictates.
- **Malformed records resync, never fail the shard**: a record whose
  framing is broken (missing/negative Content-Length, header block over
  the cap, payload overrunning the stream) is skipped by scanning
  forward to the next ``WARC/`` magic still buffered — crawl data
  always contains a few, and one bad record must not cost a 1 GB shard.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

GZIP_MAGIC = b"\x1f\x8b"

# A WARC header block larger than this is malformed (real headers are a
# few hundred bytes); bounds the scanner's header search.
HEADER_CAP = 64 * 1024

# Extra stored bytes granted to application/http payloads so the HTTP
# header block can be split off before the valve applies to the BODY
# (response headers are bounded in practice; 64 KiB is generous).
HTTP_HEAD_ALLOWANCE = 64 * 1024

WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, payload binary, n_bytes bigint, "
    "truncated boolean"
)


def iter_gunzip_chunks(
    data: bytes, *, in_chunk: int = 1 << 16, status: dict | None = None
) -> Iterator[bytes]:
    """Decompress a stream of CONCATENATED gzip members (the Common
    Crawl record-per-member layout) INCREMENTALLY, yielding bounded
    chunks — the whole decompressed shard is never resident (a ~1 GB
    crawl shard decompresses to ~4-5 GB; peak here is O(in_chunk ×
    deflate ratio) — ~3-5× on crawl data, 1032× only for a deliberate
    bomb; input is fed in ``in_chunk`` windows with no ``max_length``
    because zlib's ``unused_data`` accounting is only reliable in that
    mode).  A corrupt tail stops the stream after yielding what decoded
    (resilience over raising, matching the malformed-record policy).

    When a ``status`` dict is passed, ``status["members"]`` counts the
    COMPLETED members and ``status["error"] = True`` records a corrupt
    or truncated tail — so callers can distinguish a clean decode
    (members ≥ 1, no error; possibly zero bytes for a gzipped empty
    entity) from a failure that merely yielded nothing.  When the
    failed tail follows ≥ 1 complete member, raised ``zlib.error``
    (structurally INVALID bytes — truncation alone never raises, it
    just stalls into the not-eof branch), never produced a single
    output byte, AND does not even begin with the gzip magic
    (``1f 8b`` — per spec, bytes without it are not a gzip member at
    all), ``status["trailing_garbage"] = True`` additionally marks
    that everything YIELDED is complete — junk/padding after the last
    member, not a partially-decoded member (r12 ADVICE: callers were
    forced to treat a fully-decoded entity with framed padding as a
    partial decode).  A tail that merely ran out of input, or that
    carries the magic (a REAL member corrupted past its first bytes —
    its payload is missing, r13 review), keeps the plain error
    posture."""
    view = memoryview(data)
    pos, n = 0, len(data)
    members = 0
    carry = b""  # unused_data handed from the previous member's tail feed
    while pos < n or carry:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        member_out = False  # did THIS member yield any output?
        m_head = b""  # first bytes of THIS member's input (magic probe)
        try:
            while not d.eof:
                if carry:
                    feed, carry = carry, b""
                elif pos < n:
                    feed = view[pos : pos + in_chunk]
                    pos += len(feed)
                else:
                    break  # stream ends mid-member (truncated tail)
                if len(m_head) < 2:
                    m_head += bytes(feed[: 2 - len(m_head)])
                out = d.decompress(feed)
                if out:
                    member_out = True
                    yield out
            out = d.flush()
            if out:
                member_out = True
                yield out
        except zlib.error:
            if status is not None:
                status["error"] = True
                status["members"] = members
                if members and not member_out and m_head != b"\x1f\x8b":
                    status["trailing_garbage"] = True
            return  # corrupt member: keep what decoded, drop the tail
        if not d.eof:
            # ran out of input mid-member: could be a real member's
            # missing half even when it yielded nothing — truncation,
            # never reclassified as padding
            if status is not None:
                status["error"] = True
                status["members"] = members
            return
        members += 1
        carry = bytes(d.unused_data)  # next member starts here
    if status is not None:
        status["members"] = members


def gunzip_members(data: bytes) -> bytes:
    """Whole-bytes convenience over :func:`iter_gunzip_chunks` (tests /
    small inputs; the ingest path streams instead)."""
    return b"".join(iter_gunzip_chunks(data))


def scan_warc_stream(
    chunks: Iterator[bytes],
    *,
    max_payload_bytes: int | None = None,
) -> Iterator[tuple[dict, bytes, int]]:
    """Streaming ISO 28500 record scan: yields ``(header_fields,
    stored_payload, content_length)`` per record off a chunk iterator.

    The buffer holds at most one record head — header block (capped at
    ``HEADER_CAP``) + min(Content-Length, ``max_payload_bytes``) stored
    payload — plus one in-flight chunk; payload bytes beyond the valve
    are drained in bounded windows and verified present (a
    Content-Length that overruns the stream is malformed: the record is
    NOT emitted).  ``max_payload_bytes=None`` stores full payloads (the
    whole-bytes `iter_warc_records` path, where this reproduces the
    classic parser's semantics exactly).

    Malformed framing resyncs to the next ``WARC/`` magic still in the
    buffer; bytes already drained past the valve are not re-scanned
    (best-effort, the same class of recovery as a whole-bytes resync).
    Header names fold to lowercase.
    """
    buf = bytearray()
    eof = False

    def pull() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            chunk = next(chunks)
        except StopIteration:
            eof = True
            return False
        buf.extend(chunk)
        return True

    while True:
        # --- position on the next record magic (skips separators/junk)
        i = buf.find(b"WARC/")
        if i < 0:
            if len(buf) > 4:
                del buf[:-4]  # keep a tail in case the magic straddles
            if pull():
                continue
            return
        del buf[:i]
        # --- header block: CRLF CRLF terminated, size-capped
        hdr_end = buf.find(b"\r\n\r\n")
        while hdr_end < 0 and len(buf) <= HEADER_CAP and pull():
            hdr_end = buf.find(b"\r\n\r\n")
        if hdr_end < 0:
            if len(buf) <= HEADER_CAP:
                return  # EOF inside an unterminated header
            del buf[:5]  # header over cap: malformed, resync past magic
            continue
        fields: dict[str, str] = {}
        header = bytes(buf[:hdr_end]).decode("utf-8", "replace")
        # unfold LWS continuation lines (legal in the ISO 28500
        # named-field grammar): a line starting with SP/HT extends the
        # previous field's value — without this, a folded URI either
        # vanishes or (if it contains ':') parses as a bogus new field
        lines: list[str] = []
        for line in header.split("\r\n")[1:]:
            if line[:1] in (" ", "\t") and lines:
                lines[-1] += " " + line.strip()
            else:
                lines.append(line)
        for line in lines:
            name, sep, value = line.partition(":")
            if sep:
                fields[name.strip().lower()] = value.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            clen = -1
        body_start = hdr_end + 4
        if clen < 0:
            del buf[:body_start]
            continue
        # --- payload: store up to the valve, then drain-and-verify
        store = clen if max_payload_bytes is None else min(clen, max_payload_bytes)
        while len(buf) < body_start + store and pull():
            pass
        if len(buf) < body_start + store:
            # Content-Length overruns the stream → malformed framing;
            # resync to any record magic inside what we still hold.
            del buf[:body_start]
            continue
        payload = bytes(buf[body_start : body_start + store])
        del buf[: body_start + store]
        remaining = clen - store
        overran = False
        while remaining > 0:
            if not buf and not pull():
                overran = True
                break
            drop = min(len(buf), remaining)
            del buf[:drop]
            remaining -= drop
        if not overran:
            yield fields, payload, clen


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """(header-fields, payload) per record over whole shard bytes — a
    thin wrapper around :func:`scan_warc_stream` with no payload valve
    (tests / small inputs; `read_warc` streams with a valve instead)."""
    for fields, payload, _clen in scan_warc_stream(iter((data,))):
        yield fields, payload


def split_http_payload(
    payload: bytes,
    *,
    decode_body: bool = False,
    decode_cap: int = 2 * 1024 * 1024,
) -> tuple[int | None, bytes]:
    """(status, body) of an ``application/http`` record payload: parse
    the status code off the first line, drop the HTTP header block.
    Records without an HTTP header block come back (None, payload).

    ``decode_body=True`` additionally undoes the wire encodings real
    crawl captures carry — ``Transfer-Encoding: chunked`` framing and
    ``Content-Encoding: gzip/deflate`` compression (in that order, per
    RFC 9112 §6.1) — by delegating to :func:`decode_http_body_bounded`
    with retention capped at ``decode_cap`` (default: the 2 MiB payload
    valve), so even this convenience API can never materialize
    O(decoded) bytes from a compression bomb.  Decoding is best-effort:
    malformed framing or compression returns the body as captured (the
    malformed-record policy: keep evidence, never fail the shard)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep or not head.startswith(b"HTTP/"):
        return None, payload
    try:
        status = int(head.split(b"\r\n", 1)[0].split()[1])
    except (IndexError, ValueError):
        status = None
    if decode_body:
        body, _total = decode_http_body_bounded(head.lower(), body, decode_cap)
    return status, body


def http_header_value(head: bytes, name: bytes) -> str | None:
    """First value of an HTTP header in a raw header block (case-
    insensitive name match at line starts), decoded latin-1 (header
    values are byte-opaque per RFC 9110; latin-1 is the lossless view).
    None when absent — the caller's sniffing default applies."""
    needle = name.lower() + b":"
    for line in head.split(b"\r\n")[1:]:
        if line[: len(needle)].lower() == needle:
            return line[len(needle):].strip().decode("latin-1")
    return None


def _iter_zlib_chunks(
    data: bytes,
    wbits: int,
    *,
    in_chunk: int = 1 << 16,
    status: dict | None = None,
) -> Iterator[bytes]:
    """Single zlib/deflate stream decompressed incrementally (the
    Content-Encoding sibling of :func:`iter_gunzip_chunks`); stops at
    stream end or the first error, yielding what decoded.  When a
    ``status`` dict is passed, a mid-stream zlib error is recorded as
    ``status["error"] = True`` and ``status["eof"]`` records whether
    the stream reached its own end marker — together they distinguish
    a CLEAN decode (eof, no error; possibly zero bytes for an empty
    entity) from a truncated or corrupt one."""
    d = zlib.decompressobj(wbits)
    view = memoryview(data)
    pos, n = 0, len(data)
    try:
        while pos < n and not d.eof:
            feed = view[pos : pos + in_chunk]
            pos += len(feed)
            out = d.decompress(feed)
            if out:
                yield out
        out = d.flush()
        if out:
            yield out
        if status is not None:
            status["eof"] = d.eof
    except zlib.error:
        if status is not None:
            status["error"] = True
            status["eof"] = False
        return


def _drain_bounded(stream: Iterator[bytes], cap: int) -> tuple[bytes, int]:
    """(kept_prefix, true_total) off a chunk iterator with retention
    capped at ``cap`` — over-cap chunks are counted, never held."""
    kept: list[bytes] = []
    total = 0
    for c in stream:
        if total < cap:
            kept.append(c[: cap - total] if total + len(c) > cap else c)
        total += len(c)
    return b"".join(kept), total


# HTTP wire-coding header probes (RFC 9112 allows any OWS after the
# colon, and real crawl captures carry no-space and multi-space forms;
# a literal 'name: value' substring check misses them and emits still-
# encoded bytes as "decoded").  Heads are lowercased by the callers.
_TE_CHUNKED_RE = re.compile(rb"(?m)^transfer-encoding:[ \t]*chunked\b")
_CE_GZIP_RE = re.compile(rb"(?m)^content-encoding:[ \t]*(?:x-)?gzip\b")
_CE_DEFLATE_RE = re.compile(rb"(?m)^content-encoding:[ \t]*deflate\b")


def _http_body_encoded(head_lower: bytes) -> bool:
    """True when the (lowercased) HTTP header block declares a wire
    coding :func:`decode_http_body_bounded` can undo."""
    return bool(
        _TE_CHUNKED_RE.search(head_lower)
        or _CE_GZIP_RE.search(head_lower)
        or _CE_DEFLATE_RE.search(head_lower)
    )


def decode_http_body_bounded(
    head_lower: bytes, body: bytes, cap: int, *, status: dict | None = None
) -> tuple[bytes, int]:
    """(stored_decoded_prefix, true_decoded_length) for a captured HTTP
    body, undoing chunked framing then gzip/deflate content coding with
    RETENTION capped at ``cap`` bytes — decompression streams, the
    over-cap remainder is counted but never held, so a pathological
    compression bomb costs O(cap), not O(decoded).  A body that fails
    to decode comes back as captured (best-effort, the malformed-record
    policy).

    ``status`` (optional out-param, the `_iter_zlib_chunks` pattern):
    ``status["decode_error"] = True`` marks a corrupt or truncated
    compressed stream (the returned bytes are a PARTIAL entity — a
    caller presenting them as complete would lie), and
    ``status["undecoded"] = True`` marks the no-decode fallback (the
    returned bytes are the still-encoded capture, so the framed length
    remains the truthful ``n_bytes``), and
    ``status["trailing_garbage"] = True`` marks a COMPLETE decode
    whose Content-Length framing carried junk/padding after the last
    gzip member — the returned entity is whole, not partial (r12
    ADVICE).  A cleanly decoded EMPTY entity
    (servers do gzip zero-length bodies) returns ``(b"", 0)`` with
    neither flag — success is detected from the stream state, not from
    the byte count."""
    def _flag(key: str) -> None:
        if status is not None:
            status[key] = True

    if _TE_CHUNKED_RE.search(head_lower):
        body = dechunk_http_body(body)
    if _CE_GZIP_RE.search(head_lower):
        st: dict = {}
        kept, total = _drain_bounded(
            iter_gunzip_chunks(body, status=st), cap
        )
        if st.get("members"):
            if not st.get("error"):
                return kept, total  # clean decode (even an empty entity)
            if st.get("trailing_garbage"):
                # ≥ 1 complete member and the failed tail never
                # produced a byte: junk/padding AFTER the entity
                # inside its Content-Length framing (r12 ADVICE) —
                # the entity itself decoded completely, so it is
                # flagged (not silently clean) but NOT a partial
                _flag("trailing_garbage")
                return kept, total
        _flag("decode_error")
        if total:
            return kept, total  # partial: corrupt/truncated mid-stream
        _flag("undecoded")
        return body, len(body)
    if _CE_DEFLATE_RE.search(head_lower):
        # zlib-wrapped first, raw-deflate retry (the historical server
        # quirk).  An attempt is ACCEPTED only when its stream reached
        # its own end marker without a zlib error — a raw-deflate body
        # whose first two bytes happen to mimic a valid zlib header
        # would otherwise decode a garbage prefix under MAX_WBITS and
        # shadow the raw retry.  If both attempts fail, the larger
        # partial wins (best-effort, flagged); if nothing decoded, the
        # captured bytes stay (flagged undecoded).
        partial: tuple[bytes, int] = (b"", 0)
        for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
            st = {}
            kept, total = _drain_bounded(
                _iter_zlib_chunks(body, wbits, status=st), cap
            )
            if st.get("eof") and not st.get("error"):
                return kept, total  # clean decode (even an empty entity)
            if total > partial[1]:
                partial = (kept, total)
        _flag("decode_error")
        if partial[1]:
            return partial
        _flag("undecoded")
        return body, len(body)
    return body, len(body)


def dechunk_http_body(body: bytes) -> bytes:
    """Undo ``Transfer-Encoding: chunked`` framing (RFC 9112 §7.1):
    hex-length CRLF chunk CRLF ... 0 CRLF [trailers].  Chunk extensions
    (``;ext=val`` after the size) are ignored.  Malformed framing
    returns what decoded so far plus nothing else if nothing decoded —
    i.e. the original bytes when the first length line is not hex."""
    out: list[bytes] = []
    framed = False  # did at least one length line parse?
    pos, n = 0, len(body)
    while pos < n:
        nl = body.find(b"\r\n", pos)
        if nl == -1:
            break
        size_field = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            break
        if size < 0:
            # int(b'-6', 16) parses: a negative length line would make
            # the position arithmetic loop forever while appending the
            # near-full body each pass (attacker-controlled crawl data
            # must never hang the executor) — treat as malformed
            break
        framed = True
        if size == 0:
            break  # terminal chunk; trailers ignored
        start = nl + 2
        if start + size > n:
            out.append(body[start:n])  # truncated capture: keep the tail
            break
        out.append(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF
    if not framed:
        return body  # not actually chunk-framed: keep as captured
    return b"".join(out)


def read_wet(
    spark: SparkSession,
    path: str,
    *,
    max_payload_bytes: int = 2 * 1024 * 1024,
    glob: str | None = None,
) -> DataFrame:
    """WET shards → (target_uri, warc_date, text, n_bytes, truncated):
    Common Crawl's extracted-text sibling of WARC — same ISO 28500
    framing, ``conversion`` records whose payload is already plain
    UTF-8 text (no HTTP envelope).  A thin view over :func:`read_warc`
    that decodes the payload; pipelines that start from WET skip the
    `html_to_text` stage and go straight to quality/lang gates.

    Truncation cuts at a byte boundary, which can split a multi-byte
    UTF-8 codepoint; the decode strips the resulting replacement-char
    run off the tail of TRUNCATED rows only, so truncated text always
    ends on a clean codepoint."""
    raw = read_warc(
        spark,
        path,
        record_types=("conversion",),
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=False,
        glob=glob,
    )
    return _wet_text_select(raw)


def _wet_text_select(raw: DataFrame) -> DataFrame:
    """Shared WET payload→text projection (batch and stream must stay
    byte-identical twins; ONE spelling of the truncated-codepoint
    hygiene guarantees it)."""
    from pyspark.sql import functions as F

    decoded = F.col("payload").cast("string")
    text = F.when(
        F.col("truncated"), F.regexp_replace(decoded, "�+$", "")
    ).otherwise(decoded)
    return raw.select(
        "target_uri",
        "warc_date",
        text.alias("text"),
        "n_bytes",
        "truncated",
    )


def read_warcinfo(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Shard provenance: each shard's leading ``warcinfo`` record parsed
    to (path, record_id, warc_date, info) where ``info`` is a
    key→value map of the record's ``application/warc-fields`` payload
    (software, hostname, format, isPartOf … — what Common Crawl stamps
    on every shard).  One row per shard; join on ``path`` against
    :func:`read_warc` rows to carry crawl lineage through the pipeline
    (training-data provenance audits start here).

    Repeated field names — legal in the warc-fields named-field format —
    dedup LAST-WINS before the map is built (``map_from_entries`` under
    Spark's default ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` would
    otherwise fail the whole query on one shard's repeated header)."""
    from pyspark.sql import functions as F

    raw = read_warc(
        spark,
        path,
        record_types=("warcinfo",),
        strip_http_headers=False,
        glob=glob,
    )
    info = warcinfo_info_expr(F.col("payload").cast("string"))
    return raw.select("path", "record_id", "warc_date", info.alias("info"))


def warcinfo_info_expr(payload_str):
    """The JVM-side warc-fields → key→value map expression behind
    :func:`read_warcinfo`, exposed so the oracle gate can apply the
    SAME logic to evidence columns.  "Name: value" CRLF lines; the
    value is everything after the FIRST colon (values may themselves
    contain colons, e.g. URLs); repeated names — legal in the
    named-fields format — dedup LAST-WINS via distinct keys + nested
    filter (records are a handful of fields, the O(k²) is constant)."""
    from pyspark.sql import functions as F

    lines = F.filter(
        F.split(payload_str, "\r\n"), lambda s: s.contains(": ")
    )
    entries = F.transform(
        lines,
        lambda s: F.struct(
            F.trim(F.substring_index(s, ":", 1)).alias("k"),
            F.trim(F.regexp_replace(s, "^[^:]*:", "")).alias("v"),
        ),
    )
    keys = F.array_distinct(F.transform(entries, lambda e: e["k"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.element_at(
                F.filter(entries, lambda e: e["k"] == k), -1
            )["v"],
        ),
    )


def read_wat(
    spark: SparkSession,
    path: str,
    *,
    max_payload_bytes: int = 2 * 1024 * 1024,
    glob: str | None = None,
) -> DataFrame:
    """WAT shards → (target_uri, warc_date, json, n_bytes, truncated):
    Common Crawl's metadata sibling — ``metadata`` records whose payload
    is a JSON envelope (Envelope → Payload-Metadata →
    HTTP-Response-Metadata → HTML-Metadata: links, title, scripts; the
    published WAT structure).  Rows keep the raw JSON string; pull
    fields with ``get_json_object`` / ``from_json`` (JVM-side), or
    :func:`wat_links` for the outlink table the link-graph /
    URL-frontier pipelines start from.  Truncated envelopes are broken
    JSON by construction — filter ``truncated`` before parsing."""
    from pyspark.sql import functions as F

    raw = read_warc(
        spark,
        path,
        record_types=("metadata",),
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=False,
        glob=glob,
    )
    return raw.select(
        "target_uri",
        "warc_date",
        F.col("payload").cast("string").alias("json"),
        "n_bytes",
        "truncated",
    )


def wat_links(wat: DataFrame) -> DataFrame:
    """(target_uri, link_url) per outlink from WAT rows — the edge list
    a crawl frontier / link-graph dedup consumes.  Pure JVM JSON path
    extraction (get_json_object + from_json), no Python; truncated rows
    (broken JSON) and link-less pages drop out via the explode."""
    from pyspark.sql import functions as F

    links_json = F.get_json_object(
        F.col("json"),
        "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
        "['HTML-Metadata'].Links",
    )
    arr = F.from_json(links_json, "array<struct<path:string,url:string>>")
    return (
        wat.where(~F.col("truncated"))
        .select("target_uri", F.explode(arr).alias("l"))
        .select("target_uri", F.col("l.url").alias("link_url"))
        .where(F.col("link_url").isNotNull())
    )


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    max_payload_bytes: int = 2 * 1024 * 1024,
    strip_http_headers: bool = True,
    decode_http_body: bool = False,
    batch_records: int = 2048,
    glob: str | None = None,
) -> DataFrame:
    """WARC shards → rows: (path, record_id, warc_type, target_uri,
    warc_date, content_type, http_status, payload, n_bytes, truncated).

    ``record_types`` filters at parse time (("response",) is the HTML
    harvest; add "warcinfo"/"request"/"metadata"/"conversion" — the last
    is WET's extracted-text type — as needed; empty tuple = keep all).
    ``strip_http_headers`` splits ``application/http`` payloads and
    stores only the body (status lands in ``http_status``); the valve
    then applies to the BODY (an ``HTTP_HEAD_ALLOWANCE`` of extra bytes
    is scanned so the header block can be split off first).  ``n_bytes``
    is the pre-truncation BODY length; compose with
    `functions.html.html_to_text` for the WET-style extraction chain.

    ``decode_http_body=True`` additionally undoes the wire encodings a
    raw crawl capture carries — ``Transfer-Encoding: chunked`` framing
    and ``Content-Encoding: gzip/deflate`` — via
    :func:`decode_http_body_bounded`: decompression STREAMS with
    retention capped at the valve (a compression bomb costs O(valve)),
    ``n_bytes`` becomes the true decoded entity length, and a body that
    fails to decode is kept as captured.

    Peak memory per task is O(compressed shard + record head + output
    frame), NOT O(decompressed shard): decompression streams through
    :func:`iter_gunzip_chunks` into :func:`scan_warc_stream`, and the
    parser yields one frame per input FILE (releasing that shard before
    touching the next — `binaryFile` packs many small shards per
    partition) and every ``batch_records`` records within a file.
    """
    keep = {t.lower() for t in record_types}
    reader = spark.read.format("binaryFile")
    if glob is not None:
        # crawl directories mix *.warc.gz / *.wet.gz / *.wat.gz; the
        # filter prunes at FILE LISTING time, before any bytes move
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    parse = make_warc_parser(
        keep,
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=strip_http_headers,
        batch_records=batch_records,
        decode_http_body=decode_http_body,
    )
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length bigint, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    max_payload_bytes: int = 2 * 1024 * 1024,
    strip_http_headers: bool = True,
    decode_http_body: bool = False,
    batch_records: int = 2048,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> DataFrame:
    """The STREAMING twin of :func:`read_warc` (the repo's batch/stream-
    twin rule): a ``readStream`` over the shard directory, same record
    schema, same parser — new ``.warc.gz`` files landing in the path
    (the shape of a live crawl dropping shards into object storage)
    flow through the identical incremental scan into the streaming
    admission stack (quality gates, near-dup filters, `streaming/`).

    ``max_files_per_trigger`` bounds per-micro-batch work (one ~1 GB
    shard is already a full task; N files = N parallel tasks per batch);
    exactly-once delivery comes from the caller's checkpoint location,
    as with any file source.  The parser is byte-identical to the batch
    path — `make_warc_parser` — so batch backfill and streaming ingest
    can never disagree on a record."""
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    parse = make_warc_parser(
        {t.lower() for t in record_types},
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=strip_http_headers,
        batch_records=batch_records,
        decode_http_body=decode_http_body,
    )
    return files.mapInPandas(parse, schema=WARC_SCHEMA)


def read_wet_stream(
    spark: SparkSession,
    path: str,
    *,
    max_payload_bytes: int = 2 * 1024 * 1024,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`read_wet`: conversion records decoded to
    text rows off a live WET shard directory — the SAME
    `_wet_text_select` projection as the batch reader, so the twins
    cannot drift."""
    raw = read_warc_stream(
        spark,
        path,
        record_types=("conversion",),
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=False,
        max_files_per_trigger=max_files_per_trigger,
        glob=glob,
    )
    return _wet_text_select(raw)


def make_warc_parser(
    keep: set[str],
    *,
    max_payload_bytes: int,
    strip_http_headers: bool,
    batch_records: int,
    decode_http_body: bool = False,
):
    """The mapInPandas generator behind :func:`read_warc`, exposed so
    tests can drive it directly and assert the per-file / per-batch
    yield boundaries (the peak-memory contract)."""

    def _cols() -> dict[str, list]:
        return {
            "path": [], "record_id": [], "warc_type": [],
            "target_uri": [], "warc_date": [], "content_type": [],
            "http_status": [], "http_content_type": [], "payload": [],
            "n_bytes": [], "truncated": [],
        }

    def _frame(out: dict[str, list]) -> pd.DataFrame:
        pdf = pd.DataFrame(out)
        pdf["http_status"] = pdf["http_status"].astype("Int32")
        return pdf

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                chunks = (
                    iter_gunzip_chunks(data)
                    if data[:2] == GZIP_MAGIC
                    else iter((data,))
                )
                # store enough raw payload to split an HTTP header block
                # off before the valve applies to the body
                scan_valve = (
                    max_payload_bytes + HTTP_HEAD_ALLOWANCE
                    if strip_http_headers
                    else max_payload_bytes
                )
                out = _cols()
                for fields, payload, clen in scan_warc_stream(
                    chunks, max_payload_bytes=scan_valve
                ):
                    wtype = fields.get("warc-type", "").lower()
                    if keep and wtype not in keep:
                        continue
                    status = None
                    http_ctype = None
                    ctype = fields.get("content-type", "")
                    stored_raw = len(payload)
                    # did the scanner's valve drop tail bytes of this
                    # record?  (stored_raw == min(clen, scan_valve))
                    capture_cut = stored_raw < clen
                    decoded = False
                    decode_err = False
                    # MIME types are case-insensitive: 'Application/HTTP'
                    # is legal and written by some non-Heritrix tools
                    if strip_http_headers and ctype.lower().startswith(
                        "application/http"
                    ):
                        raw = payload
                        status, payload = split_http_payload(raw)
                        # true body length = framed length minus the
                        # stripped head (exact even when the tail was
                        # drained past the valve)
                        head_len = stored_raw - len(payload)
                        n_bytes = clen - head_len
                        if head_len:
                            # the HTTP-level media type (e.g. "text/html;
                            # charset=ISO-8859-1") — what functions/charset
                            # sniffs and every mime-routing filter keys on
                            http_ctype = http_header_value(
                                raw[:head_len], b"content-type"
                            )
                        if decode_http_body and head_len:
                            head_lower = raw[: head_len].lower()
                            if _http_body_encoded(head_lower):
                                # undo wire codings: n_bytes becomes the
                                # decoded entity length, retention stays
                                # capped at the valve (bomb-safe)
                                true_framed = n_bytes
                                dst: dict = {}
                                payload, n_bytes = decode_http_body_bounded(
                                    head_lower, payload, max_payload_bytes,
                                    status=dst,
                                )
                                decoded = not dst.get("undecoded")
                                decode_err = dst.get("decode_error", False)
                                if dst.get("undecoded"):
                                    # the captured (still-encoded) bytes
                                    # came back: the framed length stays
                                    # the truthful n_bytes — a valve-cut
                                    # 10 MB body must not report its
                                    # 2 MiB stored prefix as the size
                                    n_bytes = true_framed
                    else:
                        n_bytes = clen
                    truncated = n_bytes > max_payload_bytes
                    if truncated:
                        payload = payload[:max_payload_bytes]
                    # Stored-vs-true guard: the flag must reflect what was
                    # actually STORED, not only the valve comparison — an
                    # HTTP header block over HTTP_HEAD_ALLOWANCE can leave
                    # the stored body short of min(n_bytes, valve), a
                    # wire-decode of a capture the scan valve cut yields a
                    # prefix of the true entity even when lengths agree,
                    # and a corrupt compressed stream's partial decode is
                    # an incomplete body whatever the counters say.
                    if len(payload) < min(n_bytes, max_payload_bytes) or (
                        decoded and capture_cut
                    ) or decode_err:
                        truncated = True
                    out["path"].append(fpath)
                    out["record_id"].append(fields.get("warc-record-id", ""))
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(fields.get("warc-target-uri", ""))
                    out["warc_date"].append(fields.get("warc-date", ""))
                    out["content_type"].append(ctype)
                    out["http_status"].append(status)
                    out["http_content_type"].append(http_ctype)
                    out["payload"].append(payload)
                    out["n_bytes"].append(n_bytes)
                    out["truncated"].append(truncated)
                    if len(out["path"]) >= batch_records:
                        yield _frame(out)
                        out = _cols()
                if out["path"]:
                    yield _frame(out)  # per-FILE boundary: shard released

    return parse
