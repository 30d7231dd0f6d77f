"""Structured Streaming continuous crawl (streaming/continuous.py):
the frontier is a file stream, discovered links feed back through it,
URL-seen and host state persist across micro-batches."""

import time

import pytest

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.streaming.continuous import crawl_stream, write_seeds


def _wait_stable(spark, out_dir, timeout_s=120, settle_rounds=4,
                 min_rows=1):
    """Poll the output until the row count reaches min_rows and then
    stops growing (micro-batch cadence is not deterministic)."""
    last, stable, deadline = -1, 0, time.time() + timeout_s
    while time.time() < deadline:
        try:
            n = spark.read.parquet(out_dir).count()
        except Exception:
            n = 0
        if n == last and n >= min_rows:
            stable += 1
            if stable >= settle_rounds:
                return n
        else:
            stable = 0
        last = n
        time.sleep(1.0)
    return last


def test_streaming_bfs_with_dedup(spark, tmp_path):
    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    write_seeds(frontier, [f"http://host{i}.test/page/{i}" for i in range(3)])

    q = crawl_stream(
        spark, frontier, out, ck,
        CrawlSettings(timeout=600, extract_links=True, dedup=True,
                      max_depth=1),
        trigger_seconds=0.5,
    )
    try:
        n = _wait_stable(spark, out, min_rows=4)
        res = spark.read.parquet(out)
        # seeds fetched + at least one discovered wave
        assert n > 3
        assert res.filter("depth = 1").count() > 0
        # URL-seen held across micro-batches: no URL fetched twice
        dups = (res.filter("url is not null").groupBy("url").count()
                .filter("count > 1").count())
        assert dups == 0
        # cross-batch host_seq continuity: per-host sequences are
        # 0..n-1 with no gaps even though waves arrived in different
        # micro-batches
        rows = [
            (r["host"], r["host_seq"])
            for r in res.filter("host_seq is not null").collect()
        ]
        per_host = {}
        for h, s in rows:
            per_host.setdefault(h, []).append(s)
        for h, seqs in per_host.items():
            assert sorted(seqs) == list(range(len(seqs))), (h, sorted(seqs))
    finally:
        q.stop()


def test_streaming_seed_injection_after_start(spark, tmp_path):
    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    write_seeds(frontier, ["http://host0.test/teapot"])
    q = crawl_stream(
        spark, frontier, out, ck,
        CrawlSettings(timeout=600), trigger_seconds=0.5,
    )
    try:
        assert _wait_stable(spark, out, settle_rounds=3, min_rows=1) == 1
        # inject more work into the running stream
        write_seeds(frontier, ["http://host1.test/gzip",
                               "bogus url"])
        n = _wait_stable(spark, out, settle_rounds=3, min_rows=3)
        assert n == 3
        res = spark.read.parquet(out)
        assert res.filter("status = 418").count() == 1
        assert res.filter("status = -10").count() == 1  # parse error row
    finally:
        q.stop()


def test_streaming_robots_gate(spark, tmp_path):
    """robots.txt gating in streaming mode: disallowed paths never
    reach the output; rules persist via the catalog table."""
    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # host0.test disallows /private8/ and /page/28 (fixtures.py:300)
    write_seeds(frontier, [
        "http://host0.test/page/1",
        "http://host0.test/private8/x",
        "http://host0.test/page/28",
    ])
    q = crawl_stream(
        spark, frontier, out, ck,
        CrawlSettings(timeout=600, respect_robots=True),
        trigger_seconds=0.5,
    )
    try:
        n = _wait_stable(spark, out, settle_rounds=3, min_rows=1)
        assert n == 1
        res = spark.read.parquet(out)
        assert res.collect()[0]["path_query"] == "/page/1"
        denied = spark.read.parquet(out + "_robots_denied")
        assert denied.count() == 2
        assert set(r["error_msg"] for r in denied.collect()) == {
            "Disallowed by robots.txt"
        }
    finally:
        q.stop()


def test_streaming_restart_resumes_seen(spark, tmp_path):
    """Stop the stream, restart on the same checkpoint: the SeenFilter
    reloads its sidecar manifest (round-1 code crashed here on a
    removed private method), and re-submitted URLs are not refetched
    while new ones are."""
    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    write_seeds(frontier, ["http://host0.test/page/1",
                           "http://host1.test/page/2"])
    settings = CrawlSettings(timeout=600, dedup=True)
    q = crawl_stream(spark, frontier, out, ck, settings,
                     trigger_seconds=0.5)
    try:
        _wait_stable(spark, out, min_rows=2)
    finally:
        q.stop()

    first = spark.read.parquet(out)
    n_first = first.filter("url is not null").count()
    assert n_first == 2

    # restart; re-seed one OLD url + one NEW url
    write_seeds(frontier, ["http://host0.test/page/1",
                           "http://host2.test/page/3"])
    q2 = crawl_stream(spark, frontier, out, ck, settings,
                      trigger_seconds=0.5)
    try:
        _wait_stable(spark, out, min_rows=n_first + 1)
    finally:
        q2.stop()

    res = spark.read.parquet(out).filter("url is not null")
    urls = [r["url"] for r in res.collect()]
    assert len(urls) == len(set(urls)) == 3  # old URL skipped, new fetched
    assert any("host2.test" in u for u in urls)


def test_streaming_archive_sink(spark, tmp_path):
    """archive_dir: every micro-batch's done pages also land in
    rolled .warc.gz archives, so the streaming crawl closes the same
    loop as the batch one — the archived record set matches the
    parquet results and round-trips into documents."""
    from minicrawler_spark.sources.warc import (
        read_warc,
        warc_to_documents,
    )

    frontier = str(tmp_path / "frontier")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    warc = str(tmp_path / "warc")

    write_seeds(frontier,
                [f"http://host{i}.test/page/{i}" for i in range(3)])
    q = crawl_stream(
        spark, frontier, out, ck,
        CrawlSettings(timeout=600, extract_links=True, dedup=True,
                      max_depth=1, writehead=True),
        trigger_seconds=0.5,
        archive_dir=warc,
    )
    try:
        _wait_stable(spark, out, min_rows=4)
        res = spark.read.parquet(out)
        want = {r["url"] for r in
                res.filter("outcome = 'done'").collect()}
        got = {r["url"] for r in read_warc(spark, warc).collect()}
        assert got == want and len(got) >= 4
        # bodies were archived (the parquet results dropped them)
        assert "body" not in res.columns
        one = read_warc(spark, warc).first()
        assert len(bytes(one["body"])) > 0
        # archive -> documents adapter works on the streamed archive
        docs = warc_to_documents(spark, warc)
        n_html = res.filter(
            "outcome = 'done' and status = 200").count()
        assert docs.count() > 0 and docs.count() <= n_html
    finally:
        q.stop()
