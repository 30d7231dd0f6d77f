"""WARC sink/source for crawl results (ISO 28500 / WARC 1.1, the
public web-archive format training-data pipelines ingest).

The reference's only sink is its stdout record stream (cli.c:200-319);
a 100 TB crawl needs a durable, splittable archive instead, so this is
a north-rule addition: `write_warc` emits size-capped `.warc.gz`
archives per partition, ROLLING to a new file at `max_archive_bytes`
(each record its own gzip member, the standard layout that keeps
records individually seekable); `read_warc` streams a directory of
them back into a typed DataFrame; `read_cdxj`/`read_warc_records`
serve random access — index-filtered (offset, length) ranged reads
that fetch only the selected members. I/O goes through the same
pluggable FS layer as the seen filter's bloom sidecars
(plans/sidecar_fs.py), so executors can target POSIX or s3://-style
storage alike.

Record shape: `WARC-Type: response` with an
`application/http;msgtype=response` payload — the result row's raw
reply head when the crawl kept it (-h/writehead), else a minimal
synthesized status line + headers, followed by the body. Record IDs
are content-derived (sha256 urn), not random, so a re-run of the same
crawl produces byte-identical archives (modulo partitioning) and the
round-trip is testable.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.sidecar_fs import fs_for

__all__ = [
    "write_warc", "read_warc", "read_cdxj", "read_warc_records",
    "write_wet", "read_wet", "warc_record_bytes", "warc_to_documents",
    "warc_to_media",
]

# the crawl's virtual epoch (streaming/crawl.py CRAWL_EPOCH) rendered
# per record from elapsed_ms; WARC-Date wants ISO-8601 UTC
_EPOCH = 1_750_000_000  # == streaming.crawl.CRAWL_EPOCH


def _iso(ts: int) -> str:
    import datetime as dt

    return dt.datetime.fromtimestamp(
        ts, dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")


def _cdx_escape(url: str) -> str:
    """CDXJ lines are space-delimited with the URL first; a raw
    space/newline/tab in the URL (possible via the rawurl fallback
    for unparsed seeds) would shift the fields and make read_cdxj
    range-read garbage (ADVICE r5). Percent-encode exactly the
    delimiter-breaking bytes ('%' first so decoding is unambiguous);
    read_cdxj reverses this."""
    return (
        url.replace("%", "%25").replace(" ", "%20")
        .replace("\n", "%0A").replace("\r", "%0D").replace("\t", "%09")
    )


def _cdx_unescape(url: str) -> str:
    """Reverse _cdx_escape (%25 -> % LAST, the usual percent-decode
    ordering discipline). Also the WARC-Target-URI decode: the same
    escaping guards the WARC record header, where a raw CR/LF in the
    URL would terminate the header block before Content-Length and
    corrupt the framing of every later record in the archive."""
    for pat, rep in (("%20", " "), ("%0A", "\n"), ("%0D", "\r"),
                     ("%09", "\t"), ("%25", "%")):
        url = url.replace(pat, rep)
    return url


def _record_id(url: str, payload: bytes, salt: bytes = b"") -> str:
    """Content-derived record id (urn:sha256) — re-runs of the same
    crawl produce byte-identical archives."""
    return "<urn:sha256:%s>" % hashlib.sha256(
        url.encode("utf-8", "ignore") + b"\x00" + salt + payload
    ).hexdigest()


def _payload_digest(body: bytes) -> str:
    """WARC-Payload-Digest in the pywb/warcio convention:
    `sha1:` + unpadded base32 of the HTTP payload body (ISO 28500
    §5.8 labelled-algorithm form)."""
    import base64

    return "sha1:" + base64.b32encode(
        hashlib.sha1(body).digest()
    ).decode("ascii")


def warc_record_bytes(
    url: str,
    date_iso: str,
    http_bytes: bytes,
    warc_type: str = "response",
    extra_headers: tuple = (),
    record_id: Optional[str] = None,
    content_type: Optional[str] = None,
) -> bytes:
    """One uncompressed WARC record (headers + payload + the two
    mandatory trailing CRLFCRLF). Defaults preserve the original
    response-record shape; warcinfo/request records pass warc_type,
    content_type and extra ISO 28500 headers."""
    rid = record_id or _record_id(url, http_bytes)
    ct = content_type or "application/http;msgtype=response"
    extras = "".join("%s: %s\r\n" % (k, v) for k, v in extra_headers)
    # escape delimiter/framing bytes: WARC-Target-URI must be a URI
    # (ISO 28500 §5.12 — no raw spaces/controls), and an unescaped
    # CR/LF here would end the record header early and desync the
    # parse of every subsequent record; _parse_warc reverses this
    target = (
        "WARC-Target-URI: %s\r\n" % _cdx_escape(url) if url else ""
    )
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: %s\r\n"
        "WARC-Record-ID: %s\r\n"
        "WARC-Date: %s\r\n"
        "%s%s"
        "Content-Type: %s\r\n"
        "Content-Length: %d\r\n"
        "\r\n" % (warc_type, rid, date_iso, target, extras, ct,
                  len(http_bytes))
    ).encode("utf-8")
    return head + http_bytes + b"\r\n\r\n"


def _warcinfo_record(pid: int, seq: int) -> bytes:
    """The per-file warcinfo header record standard tooling (pywb,
    warcio validators) expects as the first member of an archive
    (ISO 28500 §6.2). Deterministic: date is the crawl epoch, id is
    content-derived from the fields + (pid, seq)."""
    from ..functions.httpproto import VERSION

    fields = (
        "software: minicrawler-spark/%s\r\n"
        "format: WARC File Format 1.1\r\n" % VERSION
    ).encode("utf-8")
    rid = _record_id("", fields, b"warcinfo:%d:%d" % (pid, seq))
    return warc_record_bytes(
        "", _iso(_EPOCH), fields,
        warc_type="warcinfo", record_id=rid,
        content_type="application/warc-fields",
    )


def _http_payload(row) -> bytes:
    """The record payload: the raw reply head when the crawl kept it,
    else a synthesized minimal head; body appended either way."""
    body = bytes(row["body"] or b"")
    head = row.get("head")
    if head:
        head = bytes(head)
        if not head.endswith(b"\r\n\r\n"):
            head += b"\r\n\r\n"
        return head + body
    status = int(row["status"] or 0)
    lines = ["HTTP/1.1 %d" % status]
    if row.get("content_type"):
        lines.append("Content-Type: %s" % row["content_type"])
    lines.append("Content-Length: %d" % len(body))
    return ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1") + body


class _Roller:
    """Per-partition rolling archive writer shared by write_warc and
    write_wet: size-capped `.{suffix}` files, one gzip member per
    record, a CDXJ sidecar per rolled file, deterministic bytes
    (gzip mtime=0, content-derived ids). Peak memory = the cap plus
    one record."""

    def __init__(self, the_fs, out_dir, pid, max_bytes,
                 suffix=".warc.gz"):
        self.fs = the_fs
        self.out_dir = out_dir
        self.pid = pid
        self.max_bytes = max_bytes
        self.suffix = suffix
        self.out_rows = []  # (path, n_records, n_bytes) per file
        self._reset()

    def _reset(self):
        self.buf = io.BytesIO()
        self.n = 0
        self.cdx = []
        self.digest = hashlib.sha256()

    def ensure_warcinfo(self):
        # lazily open each rolled file with its warcinfo record
        # (first member, ISO 28500 §6.2) — lazy so an empty
        # partition emits no file at all
        if self.buf.tell() == 0:
            self.put(_warcinfo_record(self.pid, len(self.out_rows)))

    def put(self, rec: bytes) -> None:
        """Un-indexed member (warcinfo, request records)."""
        self.buf.write(gzip.compress(rec, mtime=0))
        self.digest.update(rec)

    def put_indexed(self, rec: bytes, url: str, ts: int,
                    status: int) -> None:
        member = gzip.compress(rec, mtime=0)
        self.cdx.append(
            (url, ts, status, self.buf.tell(), len(member))
        )
        self.buf.write(member)
        self.digest.update(rec)
        self.n += 1
        if self.buf.tell() >= self.max_bytes:
            self.flush()

    def flush(self) -> None:
        """Publish the current buffer as one archive + its CDXJ
        sidecar, then reset for the next roll."""
        import json as _json

        if self.n == 0:
            return
        stem = "part-%05d-%04d-%s" % (
            self.pid, len(self.out_rows), self.digest.hexdigest()[:16]
        )
        path = "%s/%s%s" % (self.out_dir, stem, self.suffix)
        # getbuffer(): hand the FS a zero-copy view, not a copy
        self.fs.write_bytes_atomic(path, self.buf.getbuffer())
        # CDXJ sidecar: one JSON line per record with the byte
        # offset and compressed length of its gzip member — random
        # access into the archive without scanning it (the pywb/
        # OpenWayback index convention)
        lines = [
            "%s %d %s" % (
                _cdx_escape(url), ts,
                _json.dumps(
                    {"offset": off, "length": ln, "status": status,
                     "filename": stem + self.suffix},
                    sort_keys=True,
                ),
            )
            for url, ts, status, off, ln in self.cdx
        ]
        self.fs.write_bytes_atomic(
            "%s/%s.cdxj" % (self.out_dir, stem),
            ("\n".join(lines) + "\n").encode("utf-8"),
        )
        self.out_rows.append((path, self.n, self.buf.tell()))
        self._reset()


def write_warc(
    results: DataFrame,
    out_dir: str,
    fs=None,
    max_archive_bytes: int = 1 << 30,
    write_requests: bool = False,
) -> DataFrame:
    """Sink: size-capped `part-{pid}-{seq}-{digest}.warc.gz` archives
    per partition, each record an independent gzip member. The writer
    ROLLS to a new archive whenever the in-memory buffer crosses
    `max_archive_bytes` (default 1 GiB — the conventional WARC roll
    size), so peak executor memory is bounded by the cap plus one
    record regardless of partition size: a partition of tens of GiB of
    pages streams out as many ~1 GiB files instead of one
    partition-sized buffer. Each rolled file gets its own CDXJ offset
    index. Returns the manifest DataFrame (one row per rolled file:
    path, n_records, n_bytes) — an action on it performs the write
    (consistent with DataFrame writer laziness).

    Interop (ISO 28500 §6 / warcio-pywb conventions, VERDICT r4 #3):
    every rolled file opens with one `warcinfo` record; response
    records carry `WARC-Payload-Digest` (sha1 base32 of the HTTP
    body); `write_requests=True` additionally emits a `request`
    record before each response, regenerated through the engine's own
    gen_request (httpproto.py — a faithful RECONSTRUCTION of the wire
    request from the result row's method/host/path; the crawl does
    not persist per-fetch cookie/auth headers, so those are omitted)
    linked via `WARC-Concurrent-To`. n_records in the manifest and
    CDXJ entries count response records only; the read paths skip
    the non-response types."""
    the_fs = fs if fs is not None else fs_for(out_dir)
    cols = [c for c in ("url", "rawurl", "status", "content_type",
                        "elapsed_ms", "head", "body", "method",
                        "host", "hostname", "scheme", "path_query")
            if c in results.columns]

    def stage(batches: Iterator):
        import pandas as pd
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        the_fs.makedirs(out_dir)
        roller = _Roller(the_fs, out_dir, pid, max_archive_bytes)

        for pdf in batches:
            for row in pdf.to_dict("records"):
                url = row.get("url") or row.get("rawurl") or ""
                ts = _EPOCH + int(row.get("elapsed_ms") or 0) // 1000
                payload = _http_payload(row)
                body = bytes(row.get("body") or b"")
                resp_id = _record_id(url, payload)
                roller.ensure_warcinfo()
                if write_requests and row.get("path_query"):
                    from ..functions.httpproto import gen_request

                    req = gen_request(
                        row.get("method") or "GET",
                        row["path_query"], row.get("host") or "",
                        row.get("hostname") or "",
                        row.get("scheme") or "http", [],
                    )
                    roller.put(warc_record_bytes(
                        url, _iso(ts), req,
                        warc_type="request",
                        record_id=_record_id(url, req, b"request"),
                        content_type="application/http;msgtype=request",
                        extra_headers=(
                            ("WARC-Concurrent-To", resp_id),
                        ),
                    ))
                roller.put_indexed(
                    warc_record_bytes(
                        url, _iso(ts), payload,
                        record_id=resp_id,
                        extra_headers=(
                            ("WARC-Payload-Digest",
                             _payload_digest(body)),
                        ),
                    ),
                    url, ts, int(row.get("status") or 0),
                )
        roller.flush()
        yield pd.DataFrame(
            roller.out_rows, columns=["path", "n_records", "n_bytes"]
        )

    return results.select(*cols).mapInPandas(
        stage, "path string, n_records long, n_bytes long"
    )


def write_wet(
    documents: DataFrame,
    out_dir: str,
    fs=None,
    max_archive_bytes: int = 1 << 30,
) -> DataFrame:
    """WET sink: the documents table (doc_id, text) out as
    Common-Crawl-convention text-extraction archives —
    `part-*.warc.wet.gz` files of `WARC-Type: conversion` records
    (Content-Type text/plain, UTF-8 payload = the extracted text,
    WARC-Target-URI = doc_id), one warcinfo record per rolled file,
    CDXJ sidecars, content-derived record ids. WET is the corpus
    EXCHANGE format text-only consumers (CCNet-style pipelines,
    dedup researchers) ingest without HTTP parsing; the same rolling
    discipline as write_warc bounds executor memory at any partition
    size. Returns the manifest (path, n_records, n_bytes); an action
    on it performs the write."""
    the_fs = fs if fs is not None else fs_for(out_dir)
    cols = [c for c in ("doc_id", "text") if c in documents.columns]

    def stage(batches: Iterator):
        import pandas as pd
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        the_fs.makedirs(out_dir)
        roller = _Roller(the_fs, out_dir, pid, max_archive_bytes,
                         suffix=".warc.wet.gz")
        for pdf in batches:
            for row in pdf.to_dict("records"):
                url = row["doc_id"] or ""
                text = (row["text"] or "").encode("utf-8")
                roller.ensure_warcinfo()
                roller.put_indexed(
                    warc_record_bytes(
                        url, _iso(_EPOCH), text,
                        warc_type="conversion",
                        content_type="text/plain",
                    ),
                    url, _EPOCH, 0,
                )
        roller.flush()
        yield pd.DataFrame(
            roller.out_rows, columns=["path", "n_records", "n_bytes"]
        )

    return documents.select(*cols).mapInPandas(
        stage, "path string, n_records long, n_bytes long"
    )


def read_wet(spark: SparkSession, path: str,
             batch_records: int = 256, fs=None,
             chunk_bytes: int = 4 << 20) -> DataFrame:
    """WET source: a directory of `.warc.wet.gz` files back into the
    documents-table shape (doc_id, text, n_chars) — the inverse of
    write_wet, through the same streaming chunked reader. Foreign
    WET archives (e.g. Common Crawl segments) parse too: any
    `conversion` record's target URI + text payload lands as a row."""
    recs = read_warc(spark, path, batch_records=batch_records,
                     fs=fs, chunk_bytes=chunk_bytes,
                     suffix=".warc.wet.gz", want_type="conversion")
    return recs.select(
        F.col("url").alias("doc_id"),
        F.decode("body", "utf-8").alias("text"),
    ).withColumn("n_chars", F.length("text"))


def _is_own_warcinfo(data: bytes) -> bool:
    """True when `data` opens with THIS engine's warcinfo record
    (_warcinfo_record writes these exact bytes). Gates the
    WARC-Target-URI unescape (ADVICE r5): only archives this writer
    produced percent-escaped their URI headers, so foreign archives
    (e.g. Common Crawl segments, where 'a%20b' is a real URL byte
    sequence) must be read verbatim."""
    head = data[:512]
    return (
        b"WARC-Type: warcinfo" in head
        and b"software: minicrawler-spark/" in data[:1024]
    )


def _parse_warc(data: bytes, want_type: Optional[str] = "response",
                unescape: bool = False):
    """Yield (url, date, status, http_head, body) per record of
    `want_type` from an uncompressed WARC stream. For "response" the
    payload splits into HTTP head + body; for "conversion" (WET) the
    payload is the extracted text itself (status 0, empty head).
    `want_type=None` accepts any record type (the index-driven
    ranged reader already selected exactly the records it wants —
    including WET conversion records — so no type filter applies).
    `unescape` reverses this writer's WARC-Target-URI escaping and
    must only be set for archives this engine wrote (the caller
    detects that via _is_own_warcinfo / the CDXJ sidecar); foreign
    URIs pass through byte-for-byte (ADVICE r5)."""
    pos = 0
    while pos < len(data):
        if data[pos:pos + 5] != b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers = {}
        for line in data[pos:head_end].decode(
            "utf-8", "replace"
        ).split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen + 4  # skip the record's CRLFCRLF
        rtype = headers.get("warc-type")
        if want_type is not None and rtype != want_type:
            continue
        url = headers.get("warc-target-uri", "")
        if unescape:
            url = _cdx_unescape(url)
        date = headers.get("warc-date", "")
        if rtype != "response":
            yield url, date, 0, b"", payload
            continue
        http_end = payload.find(b"\r\n\r\n")
        http_head = payload[:http_end] if http_end >= 0 else payload
        body = payload[http_end + 4:] if http_end >= 0 else b""
        status = 0
        first = http_head.split(b"\r\n", 1)[0].split()
        if len(first) >= 2 and first[1].isdigit():
            status = int(first[1])
        yield url, date, status, http_head, body


def _iter_members_stream(chunks: Iterator):
    """Walk a multi-member gzip stream arriving as byte chunks,
    yielding one uncompressed member at a time. Peak memory is one
    uncompressed record + one input chunk — neither the compressed
    archive nor its inflation is ever held whole, at ANY archive
    size (including foreign archives above binaryFile's 2 GiB/file
    ceiling)."""
    import zlib

    d = zlib.decompressobj(47)  # gzip wrapper, one member
    out = []
    buf = b""
    it = iter(chunks)
    while True:
        if not buf:
            buf = next(it, None)
            if buf is None:
                break  # truncated final member drops, like gzip
        out.append(d.decompress(buf))
        if d.eof:
            yield b"".join(out)
            buf = d.unused_data  # start of the next member
            d = zlib.decompressobj(47)
            out = []
        else:
            buf = b""


def _iter_members(blob: bytes, chunk_size: int = 1 << 20):
    """In-memory convenience wrapper over the streaming walk."""
    return _iter_members_stream(
        blob[p:p + chunk_size] for p in range(0, len(blob), chunk_size)
    )


def read_warc(spark: SparkSession, path: str,
              batch_records: int = 256, fs=None,
              chunk_bytes: int = 4 << 20,
              suffix: str = ".warc.gz",
              want_type: str = "response") -> DataFrame:
    """Source: a directory of .warc.gz files (or one file) back into
    (url, warc_date, status, http_head, body, source_file).
    Splitting is per archive file, the standard WARC processing
    granularity. Each file streams through the pluggable FS in
    `chunk_bytes` ranged reads feeding the incremental gzip member
    walk (VERDICT r4 #5) — peak task memory is one record + one
    chunk, never a whole compressed archive (the old binaryFile read
    held up to max_archive_bytes per task and capped files at 2 GiB),
    and object-store reads are sequential Range GETs. Records leave
    in `batch_records`-sized Arrow batches."""
    the_fs = fs if fs is not None else fs_for(path)
    base, _, last = path.rpartition("/")
    if "*" in last:
        # glob form dir/*.warc.gz (the pre-streaming reader's syntax)
        import fnmatch

        files = ["%s/%s" % (base, nm) for nm in the_fs.listdir(base)
                 if fnmatch.fnmatch(nm, last)]
    elif path.endswith(suffix):
        files = [path]
    else:
        files = ["%s/%s" % (path, nm) for nm in the_fs.listdir(path)
                 if nm.endswith(suffix)]
    if not files:
        # fail loud: listdir returns [] for an absent directory, and
        # an empty DataFrame here would silently turn a typo'd
        # --archive path into an empty corpus downstream
        raise FileNotFoundError(
            "read_warc: no %s archives at %r" % (suffix, path)
        )
    files_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    )
    if files:
        files_df = files_df.repartition(
            min(len(files),
                2 * spark.sparkContext.defaultParallelism)
        )
    cols = ["url", "warc_date", "status", "http_head", "body",
            "source_file"]

    def stage(batches: Iterator):
        import pandas as pd

        def chunks_of(fpath):
            # size-bounded: never issue a read at/past EOF — POSIX
            # returns b'' there but object stores answer a Range GET
            # with 416 (an exception through fsspec), which a
            # "read until empty" loop would hit whenever the file
            # size is an exact multiple of chunk_bytes
            total = the_fs.size(fpath)
            pos = 0
            while pos < total:
                b = the_fs.read_range(
                    fpath, pos, min(chunk_bytes, total - pos)
                )
                if not b:
                    return  # defensive: shrunk underneath us
                yield b
                pos += len(b)

        rows = []
        for pdf in batches:
            for fpath in pdf["path"]:
                # per-file own-archive flag: this writer opens every
                # rolled file with its warcinfo record, so the flag is
                # set before any indexed record of an own archive and
                # stays False for foreign files (ADVICE r5)
                own = False
                for rec in _iter_members_stream(chunks_of(fpath)):
                    if not own and _is_own_warcinfo(rec):
                        own = True
                    for url, date, status, head, body in _parse_warc(
                            rec, want_type, unescape=own):
                        rows.append(
                            (url, date, status, head, body, fpath)
                        )
                    if len(rows) >= batch_records:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        yield pd.DataFrame(rows, columns=cols)

    return files_df.mapInPandas(
        stage,
        "url string, warc_date string, status int, http_head binary, "
        "body binary, source_file string",
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """The CDXJ sidecar indexes of an archive directory as a
    DataFrame: (url, ts, status, offset, length, filename, dir) —
    one row per archived record, distributed, no archive bytes
    touched."""
    line = F.split(F.col("value"), " ", 3)
    meta = F.from_json(
        line.getItem(2),
        "offset long, length long, status int, filename string",
    )
    # reverse _cdx_escape: specific sequences first, %25 -> % LAST
    # (same ordering discipline as percent-decoding generally)
    url_col = line.getItem(0)
    for pat, rep in (("%20", " "), ("%0A", "\n"), ("%0D", "\r"),
                     ("%09", "\t"), ("%25", "%")):
        url_col = F.replace(url_col, F.lit(pat), F.lit(rep))
    return (
        spark.read.text(
            path + ("/*.cdxj" if not path.endswith(".cdxj") else "")
        )
        .filter(F.length("value") > 0)
        .select(
            url_col.alias("url"),
            line.getItem(1).cast("long").alias("ts"),
            meta.alias("m"),
            F.regexp_replace(
                F.regexp_replace(F.input_file_name(), r"/[^/]+$", ""),
                r"^file:(//)?", "",
            ).alias("dir"),
        )
        .select("url", "ts", F.col("m.status").alias("status"),
                F.col("m.offset").alias("offset"),
                F.col("m.length").alias("length"),
                F.col("m.filename").alias("filename"), "dir")
    )


def read_warc_records(
    spark: SparkSession,
    path: str,
    selector=None,
    fs=None,
) -> DataFrame:
    """Random access into rolled archives via the CDXJ index: read
    the sidecar indexes (distributed, tiny), filter them with
    `selector` (a pyspark Column predicate over url/ts/status, or a
    callable DataFrame -> DataFrame), then fetch ONLY the selected
    records' gzip members with (offset, length) ranged reads through
    the pluggable FS — on an object store each record is one HTTP
    Range GET; nothing else of the archive is transferred. This is
    what the index is for at archive scale: pulling k records out of
    a 100 TB collection costs k ranged reads, not a scan."""
    the_fs = fs if fs is not None else fs_for(path)
    try:
        idx = read_cdxj(spark, path)
    except Exception as e:
        raise FileNotFoundError(
            "no CDXJ indexes under %r — selective reads need the "
            "sidecars write_warc produces; use read_warc for a scan "
            "(%s)" % (path, e)
        ) from None
    if selector is not None:
        idx = selector(idx) if callable(selector) else idx.filter(selector)

    def stage(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                fpath = "%s/%s" % (r["dir"], r["filename"])
                member = the_fs.read_range(
                    fpath, int(r["offset"]), int(r["length"])
                )
                # CDXJ sidecars exist only for archives this engine
                # wrote, so the records fetched through them always
                # carry this writer's URI escaping
                for url, date, status, head, body in _parse_warc(
                    gzip.decompress(member), want_type=None,
                    unescape=True,
                ):
                    rows.append((url, date, status, head, body, fpath))
            yield pd.DataFrame(
                rows,
                columns=["url", "warc_date", "status", "http_head",
                         "body", "source_file"],
            )

    return idx.mapInPandas(
        stage,
        "url string, warc_date string, status int, http_head binary, "
        "body binary, source_file string",
    )


def warc_to_documents(spark: SparkSession, path: str) -> DataFrame:
    """Archives -> the documents-table shape every training-data
    operator consumes: (doc_id, text, n_chars) from each 2xx
    response's body via the engine's OWN pipeline, charset chain
    included: the archived reply head goes through the same
    parse_head + dispatch_headers as a live fetch (so a `charset=`
    declared only in the Content-Type header wins, with the
    reference's leading-space + <16-char quirks, httpproto.py:186-193
    / crawler.c:1482), then detect_charset_from_html, then the
    ISO-8859-1 default (streaming/crawl.py finish pipeline /
    crawler.c:1489) — never a silent UTF-8 guess. A record whose
    conversion fails is skipped, mirroring the live path's
    charset-conversion-error result (not `done`, so absent from a
    live-built documents table). This closes the loop: crawl ->
    .warc.gz -> documents -> dedup/quality/clusters produce the same
    bytes on archived corpora as on live results, including
    windows-1250/Shift-JIS pages whose charset exists only in the
    header."""
    recs = read_warc(spark, path)

    def stage(batches: Iterator):
        import pandas as pd

        from ..functions.html2text import (
            convert_charset,
            detect_charset_from_html,
            to_spans,
        )
        from ..functions.httpproto import (
            ResponseState,
            dispatch_headers,
            parse_head,
        )
        from ..operators.textstats import lang_guess  # noqa: F401 (doc)

        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if not (200 <= int(r["status"] or 0) < 300):
                    continue
                body = bytes(r["body"] or b"")
                # the engine's header dispatch over the archived head:
                # h1 heads are raw; h2 heads were synthesized
                # HTTP/1.1-style at fetch time (sources/http2.py:615),
                # so parse_head covers both
                st = ResponseState(method="GET")
                parsed = parse_head(bytes(r["http_head"] or b""))
                if parsed is not None:
                    dispatch_headers(st, parsed[0], parsed[1])
                ctype_main = (
                    (st.contenttype or "").split(";")[0]
                    .strip().lower().split("/")[0]
                )
                if ctype_main in ("image", "audio", "video"):
                    # binary media never becomes a text document on
                    # the live path (no spans for non-html bodies) —
                    # warc_to_media is the adapter for these records
                    continue
                is_html = bool(st.contenttype and "html" in st.contenttype)
                charset = st.charset
                if not charset:
                    charset = detect_charset_from_html(body) or ""
                if not charset:
                    charset = "ISO-8859-1"  # crawler.c:1489 default
                conv = convert_charset(body, charset)
                if conv is None:
                    continue  # live path marks this a conversion error
                body = conv
                if is_html:
                    spans, _links = to_spans(body)
                    text = "".join(
                        s["text"] for s in spans if s["kind"] == "text"
                    )
                else:
                    text = body.decode("utf-8", "replace")
                rows.append((r["url"], text, len(text)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "n_chars"]
            )

    return recs.mapInPandas(
        stage, "doc_id string, text string, n_chars long"
    )


def warc_to_media(spark: SparkSession, path: str) -> DataFrame:
    """Archives -> the media-table shape (operators/multimodal.py
    MEDIA_SCHEMA): each 2xx response whose Content-Type main type is
    image/audio/video becomes (media_ref=url, kind, content_type,
    data=payload bytes). The media twin of warc_to_documents — feeds
    decode_pixels / decode_and_featurize / decode_audio / probe_av
    so the archive path yields the same decoded samples as a live
    crawl's media fetches."""
    recs = read_warc(spark, path)

    def stage(batches: Iterator):
        import pandas as pd

        from ..functions.httpproto import (
            ResponseState,
            dispatch_headers,
            parse_head,
        )

        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                if not (200 <= int(r["status"] or 0) < 300):
                    continue
                st = ResponseState(method="GET")
                parsed = parse_head(bytes(r["http_head"] or b""))
                if parsed is not None:
                    dispatch_headers(st, parsed[0], parsed[1])
                ctype = (st.contenttype or "").split(";")[0].strip().lower()
                kind = ctype.split("/")[0] if "/" in ctype else ""
                if kind not in ("image", "audio", "video"):
                    continue
                rows.append((r["url"], kind, ctype,
                             bytearray(r["body"] or b"")))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "kind", "content_type", "data"],
            )

    from ..operators.multimodal import MEDIA_SCHEMA

    return recs.mapInPandas(stage, MEDIA_SCHEMA)
