"""WARC sink/source (sources/warc.py): crawl → write_warc →
read_warc round-trip, record framing, determinism, and the pluggable
FS path."""

import gzip
import os

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.sources.warc import (
    _parse_warc,
    read_warc,
    warc_record_bytes,
    write_warc,
)
from minicrawler_spark.streaming.crawl import crawl


def test_warc_record_framing_and_determinism():
    http = b"HTTP/1.1 200\r\nContent-Type: text/plain\r\n\r\nhello"
    a = warc_record_bytes("http://x.test/a", "2025-06-15T12:00:00Z", http)
    b = warc_record_bytes("http://x.test/a", "2025-06-15T12:00:00Z", http)
    assert a == b  # content-derived record id -> reproducible archives
    assert a.startswith(b"WARC/1.1\r\nWARC-Type: response\r\n")
    assert b"WARC-Target-URI: http://x.test/a\r\n" in a
    assert b"Content-Length: %d\r\n" % len(http) in a
    assert a.endswith(http + b"\r\n\r\n")
    # parses back
    recs = list(_parse_warc(a))
    assert recs == [
        ("http://x.test/a", "2025-06-15T12:00:00Z", 200,
         b"HTTP/1.1 200\r\nContent-Type: text/plain", b"hello"),
    ]


def test_warc_roundtrip_through_crawl(spark, tmp_path):
    """Fixture crawl -> .warc.gz archives -> read back: every done
    page's url/status/body survives byte-exact."""
    out = str(tmp_path / "warc")
    res = crawl(
        spark,
        ["http://host%d.test/page/0" % i for i in range(6)],
        CrawlSettings(timeout=600, writehead=True),
    )
    done = res.filter("outcome = 'done'")
    want = {
        r["url"]: (r["status"], bytes(r["body"] or b""))
        for r in done.collect()
    }
    manifest = write_warc(done, out).collect()
    assert sum(m["n_records"] for m in manifest) == len(want)
    for m in manifest:
        assert os.path.exists(m["path"])
        assert m["path"].endswith(".warc.gz")
        # every record is its own gzip member (seekable layout):
        # the file must still decompress as concatenated members
        with open(m["path"], "rb") as f:
            gzip.decompress(f.read())

    got = {
        r["url"]: (r["status"], bytes(r["body"] or b""))
        for r in read_warc(spark, out).collect()
    }
    assert got == want

    # CDXJ sidecars: every record addressable by (offset, length) —
    # seek + single-member gunzip must yield exactly that record
    import glob as _glob
    import json as _json

    n_indexed = 0
    for cdxj in _glob.glob(out + "/*.cdxj"):
        warc_path = cdxj[:-5] + ".warc.gz"
        blob = open(warc_path, "rb").read()
        for line in open(cdxj).read().splitlines():
            url, _ts, meta = line.split(" ", 2)
            m = _json.loads(meta)
            member = blob[m["offset"]:m["offset"] + m["length"]]
            rec = gzip.decompress(member)
            u, _d, status, _h, body = next(iter(_parse_warc(rec)))
            assert u == url and (status, body) == want[url]
            n_indexed += 1
    assert n_indexed == len(want)
    # the stored payload head is the crawl's RAW reply head
    one = read_warc(spark, out).first()
    assert bytes(one["http_head"]).startswith(b"HTTP/1.1 ")


def test_warc_to_documents_pipeline(spark, tmp_path):
    """Archive -> documents-table adapter: text extracted from the
    archived HTML equals the engine's own span text for the same
    pages, and the result feeds the training-data operators
    unchanged (crawl -> warc -> documents -> exact_dedup)."""
    from minicrawler_spark.operators.dedup import exact_dedup
    from minicrawler_spark.sources.warc import warc_to_documents

    out = str(tmp_path / "warc")
    res = crawl(
        spark,
        ["http://host%d.test/page/0" % i for i in range(4)],
        CrawlSettings(timeout=600, writehead=True, convert_to_text=True),
    )
    done = res.filter("outcome = 'done'")
    want_text = {
        r["url"]: "".join(
            s["text"] for s in (r["spans"] or []) if s["kind"] == "text"
        )
        for r in done.collect()
    }
    # archive the RAW crawl (body as fetched; writehead keeps the head)
    raw = crawl(
        spark,
        ["http://host%d.test/page/0" % i for i in range(4)],
        CrawlSettings(timeout=600, writehead=True),
    ).filter("outcome = 'done'")
    write_warc(raw, out).collect()

    docs = warc_to_documents(spark, out)
    got = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == want_text
    assert all(r["n_chars"] == len(got[r["doc_id"]])
               for r in docs.collect())
    # operators consume it directly
    assert exact_dedup(docs).count() == len(want_text)


def test_warc_write_through_fs_shim(spark, tmp_path):
    """The sink honors the pluggable FS (executors pickle it)."""
    from tests.test_seen_scale import _SlowShimFS

    out = str(tmp_path / "warc")
    res = crawl(
        spark, ["http://host0.test/page/0"], CrawlSettings(timeout=600)
    ).filter("outcome = 'done'")
    manifest = write_warc(res, out, fs=_SlowShimFS(delay=0)).collect()
    assert manifest and os.path.exists(manifest[0]["path"])
    got = read_warc(spark, out).collect()
    assert len(got) == 1 and got[0]["status"] == 200
