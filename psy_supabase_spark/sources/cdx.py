"""CDX record-level random access — the index leg of the Common Crawl
boundary.

Real crawl pipelines do not re-scan 64k WARC shards after a filter:
they query the published CDX(J) index (`urlkey timestamp {json:
filename, offset, length, status, mime, ...}` lines, one per capture)
and then fetch exactly the referenced records, exploiting the fact that
every Common Crawl record is its OWN gzip member — a byte range
``[offset, offset+length)`` of a shard decompresses independently.
Pure public knowledge: the CDXJ line format (pywb / cc-index), RFC 1952
gzip member framing, and ISO 28500 record grammar.

Spark mapping at 100 TB:

- **The index is a DataFrame** (`read_cdx` / `index_warc_members`), so
  the selective step — "which records do I want?" — is ordinary
  predicate-pushdown SQL over urlkey/status/mime, not byte scanning.
- **`fetch_records` shuffles the hit list by shard filename** so each
  task opens a shard ONCE and range-reads its hits in offset order
  (object stores and page caches both reward monotone reads), then
  feeds the decompressed records through the PRODUCTION WARC parser
  (`warc.make_warc_parser`) — batch fetch and full-scan ingest can
  never disagree on a record.
- **Peak memory per task is O(one fetched record + output frame)**:
  each member decompresses alone (capped by ``member_cap`` against
  bombs), decompressed records accumulate only up to ``flush_bytes``
  before a parse frame is emitted, and the parser's payload valve
  applies downstream exactly as in `read_warc`.
- **Stale offsets resync, never fail the fetch**: an offset that no
  longer points at a gzip member (index drift after shard repack)
  scans forward to the next member magic inside the fetched window,
  and a member that extends past the window's end is completed by
  bounded extension reads — the same best-effort posture as the
  malformed-record policy in `sources/warc`.
"""

from __future__ import annotations

import posixpath
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import warc

# RFC 1952: ID1 ID2 CM=8 (deflate) — the member magic fetch resyncs to.
GZIP_MEMBER_MAGIC = b"\x1f\x8b\x08"

CDX_INDEX_SCHEMA = (
    "filename string, offset bigint, length bigint, urlkey string, "
    "timestamp string, url string, warc_type string, warc_date string, "
    "status int, mime string, digest string"
)

# The JSON block of a CDXJ line (numeric fields are strings, per the
# published format); unknown keys are simply absent from the struct.
_CDXJ_JSON_SCHEMA = (
    "struct<url:string,filename:string,offset:string,length:string,"
    "status:string,mime:string,digest:string>"
)


def surt_key(url: str) -> str:
    """SURT-style canonical url key (``com,example)/path``): scheme
    dropped, host labels reversed and comma-joined, lowercased, userinfo
    stripped, port kept.  A deliberately small subset of the full SURT
    rules (no www-strip, no query-param sort) — enough to make the key
    sortable by registered domain, which is what index pruning needs."""
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)([^#]*)", url)
    if not m:
        return url.lower()
    host, rest = m.group(1).lower(), (m.group(2) or "/").lower()
    host = host.rsplit("@", 1)[-1]
    if host.startswith("["):
        # IPv6 literal: the address's own ':'s are not a port separator
        # and an IP has no labels to reverse — keep [addr](:port) as-is
        i = host.find("]")
        if i >= 0:
            return host + ")" + (rest or "/")
    port = ""
    if ":" in host:
        host, _, port = host.partition(":")
        port = ":" + port
    return ",".join(reversed(host.split("."))) + port + ")" + (rest or "/")


def read_cdx(spark: SparkSession, path: str, *, glob: str | None = None) -> DataFrame:
    """CDXJ index lines → DataFrame (urlkey, timestamp, url, filename,
    offset, length, status, mime, digest).  Plain or ``.gz`` text files;
    the JSON block parses JVM-side (`from_json`), offsets/lengths cast
    from the format's string-typed numbers.  Filter THIS DataFrame, then
    hand it to :func:`fetch_records` — the filter is ordinary Catalyst
    SQL over a columnar scan, no WARC bytes move until the fetch."""
    reader = spark.read
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    lines = reader.text(path).where(F.length(F.trim("value")) > 0)
    parts = F.split("value", " ", 3)
    # malformed lines DROP (size guard) and malformed numbers NULL
    # (try_cast) instead of failing the read — under Spark 4's default
    # ANSI mode a bare element_at/cast throws, and one junk line in a
    # multi-TB published index must not kill the job (the same
    # resilience posture as the WARC record scanner); published CDX
    # really does carry '-' placeholders (e.g. status on revisits).
    lines = lines.where(F.size(parts) >= 3)
    j = F.from_json(F.element_at(parts, 3), _CDXJ_JSON_SCHEMA)
    return lines.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("timestamp"),
        j["url"].alias("url"),
        j["filename"].alias("filename"),
        j["offset"].try_cast("bigint").alias("offset"),
        j["length"].try_cast("bigint").alias("length"),
        j["status"].try_cast("int").alias("status"),
        j["mime"].alias("mime"),
        j["digest"].alias("digest"),
    )


def format_cdxj(index: DataFrame) -> DataFrame:
    """Index rows → CDXJ ``value`` lines (the inverse of
    :func:`read_cdx`): ``urlkey timestamp {json}`` with offset/length
    rendered as strings per the published format.  Write with
    ``df.write.text`` to publish an index next to the shards."""
    fields = [
        F.col("url"),
        F.col("filename"),
        F.col("offset").cast("string").alias("offset"),
        F.col("length").cast("string").alias("length"),
        F.col("status").cast("string").alias("status"),
        F.col("mime"),
    ]
    if "digest" in index.columns:
        fields.append(F.col("digest"))
    j = F.to_json(F.struct(*fields))  # to_json drops null fields
    # null urlkey/timestamp render as '-' (the format's placeholder):
    # concat_ws SKIPS nulls, which would shift the line to 2 tokens and
    # corrupt the published index on read-back
    return index.select(
        F.concat_ws(
            " ",
            F.coalesce(F.col("urlkey"), F.lit("-")),
            F.coalesce(F.col("timestamp"), F.lit("-")),
            j,
        ).alias("value")
    )


def dedupe_captures(index: DataFrame) -> DataFrame:
    """The classic CDX capture dedup: one index row per distinct payload
    ``digest`` (the earliest capture by timestamp wins, URL-agnostic —
    the same page served at many URLs or re-crawled unchanged collapses
    to one fetch).  Feed the result to :func:`fetch_records` to pull
    each distinct payload exactly once.  Requires an index with digests
    (``index_warc_members(digest=True)`` or the published CDX).  Rows
    without a digest pass through untouched (no evidence = no dedup).
    One shuffle on the digest key; at crawl scale the min-by reduces
    map-side like any agg."""
    from pyspark.sql.window import Window

    no_digest = index.where(F.col("digest").isNull())
    w = Window.partitionBy("digest").orderBy(
        F.asc_nulls_last("timestamp"), F.asc("filename"), F.asc("offset")
    )
    first = (
        index.where(F.col("digest").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return first.unionByName(no_digest)


def _parse_member_head(decompressed_head: bytes) -> dict:
    """WARC header fields + HTTP status off the first record's
    decompressed prefix (the index builder never holds a full payload).

    ``mime`` follows the PUBLISHED CDX convention: for
    ``application/http`` records it is the HTTP payload's Content-Type
    (``text/html``), not the WARC envelope's — a filter written for the
    published index (``mime.startswith('text/html')``) must behave
    identically on a locally built one.  Non-http records keep the WARC
    Content-Type."""
    out: dict = {
        "warc_type": "", "url": "", "warc_date": "", "mime": "",
        "status": None,
    }
    start = decompressed_head.find(b"WARC/")
    if start < 0:
        return out
    hdr_end = decompressed_head.find(b"\r\n\r\n", start)
    if hdr_end < 0:
        return out
    header = decompressed_head[start:hdr_end].decode("utf-8", "replace")
    fields: dict[str, str] = {}
    lines: list[str] = []  # unfold LWS continuations (ISO 28500 grammar)
    for line in header.split("\r\n")[1:]:
        if line[:1] in (" ", "\t") and lines:
            lines[-1] += " " + line.strip()
        else:
            lines.append(line)
    for line in lines:
        name, sep, value = line.partition(":")
        if sep:
            fields[name.strip().lower()] = value.strip()
    out["warc_type"] = fields.get("warc-type", "").lower()
    out["url"] = fields.get("warc-target-uri", "")
    out["warc_date"] = fields.get("warc-date", "")
    out["mime"] = fields.get("content-type", "")
    payload = decompressed_head[hdr_end + 4 :]
    # case-insensitive, matching make_warc_parser and the (?i) digest
    # regex (r12 ADVICE: an 'Application/HTTP' record otherwise kept
    # the WARC envelope mime + a null status)
    if out["mime"].lower().startswith("application/http") and payload.startswith(
        b"HTTP/"
    ):
        try:
            out["status"] = int(payload.split(b"\r\n", 1)[0].split()[1])
        except (IndexError, ValueError):
            pass
        http_end = payload.find(b"\r\n\r\n")
        http_hdr = payload[: http_end if http_end >= 0 else len(payload)]
        m = re.search(
            rb"(?im)^content-type:[ \t]*([^\r\n]+)", http_hdr
        )
        out["mime"] = (
            m.group(1).decode("utf-8", "replace").strip() if m else ""
        )
    return out


def index_warc_members(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    head_bytes: int = warc.HEADER_CAP,
    in_chunk: int = 1 << 16,
    digest: bool = False,
) -> DataFrame:
    """Build a record-level index over WARC shards: one row per gzip
    member with its EXACT (filename, offset, length) plus the record's
    header metadata (urlkey/url/timestamp/type/status/mime) — what the
    published CDX carries, derivable locally when no index ships with
    the shards.  Memory is O(head_bytes): each member decompresses
    incrementally and only the first ``head_bytes`` are retained for
    header parsing; offsets come from zlib's ``unused_data`` accounting.
    One binaryFile task per shard, same macro shape as `read_warc`.

    ``digest=True`` additionally computes the published index's payload
    digest (``sha1:<base32>``, hashed INCREMENTALLY — still O(chunk)
    memory) — the key the classic CDX capture-dedup
    (`dedupe_captures`) groups on.  Per the published
    WARC-Payload-Digest convention the digest covers the HTTP ENTITY
    BODY for ``application/http`` records (two captures of an
    unchanged page must collapse even though their Date/Set-Cookie
    response headers differ) and the whole Content-Length-framed
    payload for everything else; records whose framing can't be
    established inside the ``head_bytes`` retention get a null
    digest (no evidence = no dedup, the dedupe_captures posture)."""
    import base64
    import hashlib

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "filename", "offset", "length", "urlkey", "timestamp",
                    "url", "warc_type", "warc_date", "status", "mime",
                    "digest",
                )
            }
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                n = len(data)
                pos = data.find(GZIP_MEMBER_MAGIC)
                while 0 <= pos < n:
                    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                    head = b""
                    fed_end = pos
                    broken = False
                    # incremental payload digest state: the window
                    # [hash_start, pay_end) of the decompressed stream
                    # is hashed chunk-by-chunk once the framing is known
                    # — nothing is buffered.  hash_start is the WARC
                    # payload start for plain records, the HTTP body
                    # start for application/http ones (the published
                    # WARC-Payload-Digest convention).  Discovery can
                    # only happen while the head retention is still
                    # growing (head mirrors the stream from 0 up to the
                    # cap), so head + the current chunk always cover the
                    # discovered range with no hole.
                    sha = hashlib.sha1() if digest else None
                    dec_pos = 0  # decompressed offset of the current chunk
                    pay_start = pay_end = None
                    hash_start = None
                    is_http = False
                    hashed_to = 0
                    try:
                        while not d.eof and fed_end < n:
                            feed = data[fed_end : fed_end + in_chunk]
                            fed_end += len(feed)
                            chunk = d.decompress(feed)
                            prev_head = len(head)
                            if prev_head < head_bytes:
                                head += chunk[: head_bytes - prev_head]
                            if sha is not None and hash_start is None:
                                if pay_start is None:
                                    he = head.find(b"\r\n\r\n")
                                    if he >= 0:
                                        # \r? before $: the header lines
                                        # are CRLF-terminated, and in
                                        # MULTILINE '$' matches before
                                        # the \n only — without it every
                                        # Content-Length that is not the
                                        # LAST header fails to parse
                                        m = re.search(
                                            rb"(?im)^content-length:[ \t]*(\d+)[ \t]*\r?$",
                                            head[:he],
                                        )
                                        if m:
                                            pay_start = he + 4
                                            pay_end = pay_start + int(m.group(1))
                                            is_http = bool(re.search(
                                                rb"(?im)^content-type:[ \t]*application/http",
                                                head[:he],
                                            ))
                                        else:
                                            sha = None  # no framing
                                    elif len(head) >= head_bytes:
                                        sha = None  # header over the cap
                                if sha is not None and pay_start is not None:
                                    if not is_http:
                                        hash_start = pay_start
                                    elif (
                                        len(head) >= pay_start + 5
                                        or len(head) >= pay_end
                                    ):
                                        if head[pay_start : pay_start + 5] != b"HTTP/":
                                            hash_start = pay_start
                                        else:
                                            hb = head.find(b"\r\n\r\n", pay_start)
                                            if 0 <= hb and hb + 4 <= pay_end:
                                                hash_start = hb + 4
                                            elif hb < 0 and (
                                                len(head) >= head_bytes
                                                or len(head) >= pay_end
                                            ):
                                                sha = None  # headers over cap / malformed
                                    elif len(head) >= head_bytes:
                                        sha = None
                                if sha is not None and hash_start is not None:
                                    sha.update(
                                        head[hash_start : min(pay_end, len(head))]
                                    )
                                    hashed_to = max(
                                        hash_start, min(pay_end, len(head))
                                    )
                            if sha is not None and hash_start is not None:
                                lo = max(hashed_to, dec_pos)
                                hi = min(pay_end, dec_pos + len(chunk))
                                if hi > lo:
                                    sha.update(chunk[lo - dec_pos : hi - dec_pos])
                                    hashed_to = hi
                            dec_pos += len(chunk)
                    except zlib.error:
                        broken = True
                    if broken or not d.eof:
                        # corrupt/truncated member: resync to the next magic
                        nxt = data.find(GZIP_MEMBER_MAGIC, pos + 1)
                        pos = nxt
                        continue
                    length = fed_end - len(d.unused_data) - pos
                    meta = _parse_member_head(head)
                    out["filename"].append(fpath)
                    out["offset"].append(pos)
                    out["length"].append(length)
                    out["urlkey"].append(
                        surt_key(meta["url"]) if meta["url"] else ""
                    )
                    out["timestamp"].append(
                        re.sub(r"\D", "", meta["warc_date"])[:14]
                    )
                    out["url"].append(meta["url"])
                    out["warc_type"].append(meta["warc_type"])
                    out["warc_date"].append(meta["warc_date"])
                    out["status"].append(meta["status"])
                    out["mime"].append(meta["mime"])
                    out["digest"].append(
                        "sha1:"
                        + base64.b32encode(sha.digest()).decode("ascii")
                        if sha is not None
                        and pay_end is not None
                        and hashed_to >= pay_end
                        else None
                    )
                    nxt = pos + length
                    if nxt >= n:
                        break
                    if data[nxt : nxt + 3] != GZIP_MEMBER_MAGIC:
                        nxt = data.find(GZIP_MEMBER_MAGIC, nxt)
                    pos = nxt
            pdf_out = pd.DataFrame(out)
            pdf_out["status"] = pdf_out["status"].astype("Int32")
            yield pdf_out

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    return files.mapInPandas(_index, CDX_INDEX_SCHEMA)


def _open_input(path: str):
    """Random-access file handle for a shard path: plain ``open`` for
    local/file: paths, pyarrow.fs for object-store URIs (s3://, hdfs://,
    gs:// — resolved on the EXECUTOR, no JVM gateway needed)."""
    if "://" not in path or path.startswith("file:"):
        local = path
        if local.startswith("file:"):
            local = "/" + local[5:].lstrip("/")
        return open(local, "rb")
    from pyarrow import fs as pafs

    fsys, p = pafs.FileSystem.from_uri(path)
    return fsys.open_input_file(p)


def _decompress_one_member(
    first: bytes, read_more, cap: int, *, in_chunk: int = 1 << 16
) -> bytes | None:
    """Decompress exactly ONE gzip member starting at first[0], pulling
    extension bytes via ``read_more()`` when the indexed length under-
    covers it; None on corruption, truncation, or a member whose
    decompressed size exceeds ``cap`` (bomb guard)."""
    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    out: list[bytes] = []
    total = 0
    feed = first
    while True:
        view = memoryview(feed)
        fpos = 0
        while fpos < len(view) and not d.eof:
            try:
                chunk = d.decompress(view[fpos : fpos + in_chunk])
            except zlib.error:
                return None
            fpos += min(in_chunk, len(view) - fpos)
            out.append(chunk)
            total += len(chunk)
            if total > cap:
                return None
        if d.eof:
            return b"".join(out)
        feed = read_more()
        if not feed:
            return None  # member incomplete and no more bytes to pull


def fetch_records(
    index: DataFrame,
    *,
    warc_root: str | None = None,
    record_types: tuple[str, ...] = (),
    max_payload_bytes: int = 2 * 1024 * 1024,
    strip_http_headers: bool = True,
    decode_http_body: bool = False,
    batch_records: int = 2048,
    member_cap: int = 1 << 30,
    flush_bytes: int = 8 * 1024 * 1024,
    extension_reads: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fetch exactly the WARC records an index filter selected: each
    (filename, offset, length) row range-reads one gzip member and
    parses it through the PRODUCTION parser (`warc.make_warc_parser`),
    returning the same row schema as `read_warc` — so a 1%-selectivity
    filter pulls N records, not N shards.

    ``index`` needs (filename, offset, length) columns — from
    :func:`read_cdx` or :func:`index_warc_members`.  Relative filenames
    resolve against ``warc_root`` (the published-index convention);
    absolute/URI filenames are used as-is.  The hit list is shuffled by
    filename so each task opens a shard once and reads its hits in
    offset order; ``record_types=()`` keeps every fetched record (they
    were selected by the index filter already).

    Stale-index tolerance: an offset not on a member boundary resyncs
    forward to the next gzip magic inside its window; a member the
    indexed length under-covers is completed by up to
    ``extension_reads`` further window-sized reads.  Unrecoverable rows
    are skipped, never fail the fetch."""
    keep = {t.lower() for t in record_types}
    parse = warc.make_warc_parser(
        keep,
        max_payload_bytes=max_payload_bytes,
        strip_http_headers=strip_http_headers,
        batch_records=batch_records,
        decode_http_body=decode_http_body,
    )

    def _resolve(fname: str) -> str:
        if warc_root is None or "://" in fname or fname.startswith(("/", "file:")):
            return fname
        return posixpath.join(warc_root, fname)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fname, grp in pdf.groupby("filename", sort=False):
                full = _resolve(str(fname))
                try:
                    f = _open_input(full)
                except OSError:
                    continue  # shard gone: skip its hits, keep the fetch
                try:
                    buf: list[bytes] = []
                    buf_n = 0
                    for off, ln in sorted(
                        zip(grp["offset"], grp["length"])
                    ):
                        if pd.isna(off) or pd.isna(ln):
                            continue  # index row without a range: skip
                        f.seek(int(off))
                        window = f.read(int(ln))
                        ext = [0]

                        def _more(_f=f, _ext=ext, _ln=int(ln)):
                            if _ext[0] >= extension_reads:
                                return b""
                            _ext[0] += 1
                            return _f.read(max(_ln, 1 << 16))

                        # stale-offset resync: try each member magic in
                        # the window until one decompresses; the
                        # extension-read budget is PER TRY (a false
                        # magic that burns the budget must not starve
                        # the true member behind it)
                        rec = None
                        start = window.find(GZIP_MEMBER_MAGIC)
                        tries = 0
                        while start >= 0 and tries < 4 and rec is None:
                            ext[0] = 0
                            rec = _decompress_one_member(
                                window[start:], _more, member_cap
                            )
                            if rec is None:
                                # reposition past the window (extension
                                # reads moved the cursor); a seek is
                                # free, re-reading the window is not
                                f.seek(int(off) + len(window))
                                start = window.find(
                                    GZIP_MEMBER_MAGIC, start + 1
                                )
                                tries += 1
                        if rec is None:
                            continue
                        buf.append(rec)
                        buf_n += len(rec)
                        if buf_n >= flush_bytes:
                            frame = pd.DataFrame(
                                {"path": [full], "content": [b"".join(buf)]}
                            )
                            yield from parse(iter([frame]))
                            buf, buf_n = [], 0
                    if buf:
                        frame = pd.DataFrame(
                            {"path": [full], "content": [b"".join(buf)]}
                        )
                        yield from parse(iter([frame]))
                finally:
                    f.close()

    # rows without a fetchable range (read_cdx of a line with '-'
    # placeholders) drop JVM-side — 'unrecoverable rows are skipped,
    # never fail the fetch' includes them
    hits = index.select("filename", "offset", "length").where(
        F.col("filename").isNotNull()
        & F.col("offset").isNotNull()
        & F.col("length").isNotNull()
    )
    hits = (
        hits.repartition(num_partitions, "filename")
        if num_partitions is not None
        else hits.repartition("filename")
    )
    return hits.mapInPandas(_fetch, warc.WARC_SCHEMA)
