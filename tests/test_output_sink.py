"""Request-header generation (genrequest, crawler.c:756-872), the
impatient cutoff (exitprematurely, crawler.c:1984-2011), the timing
struct, and the text result sink (output, cli.c:200-319)."""

import pytest

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.functions.output import format_timing, render_output, to_text
from minicrawler_spark.streaming.crawl import crawl


def _crawl_map(spark, seeds, settings):
    res = crawl(spark, seeds, settings).cache()
    return res, {r["index"]: r for r in res.collect()}


# ---------------------------------------------------------------------------
# header generation against the /headers echo
# ---------------------------------------------------------------------------


def test_default_headers_and_ua_override(spark):
    _, rows = _crawl_map(
        spark,
        ["http://host0.test/headers"],
        CrawlSettings(timeout=600, customagent="my-agent/1.0"),
    )
    echoed = bytes(rows[0]["body"]).decode()
    assert "User-Agent: my-agent/1.0" in echoed
    assert "Accept: */*" in echoed            # default (cli.c Accept rule)
    assert "Accept-Encoding" not in echoed    # only with -g


def test_custom_header_block_and_accept_suppression(spark):
    _, rows = _crawl_map(
        spark,
        ["http://host0.test/headers"],
        CrawlSettings(
            timeout=600,
            customheader="X-Custom: val\nAccept: text/html\n",
            gzip=True,
        ),
    )
    echoed = bytes(rows[0]["body"]).decode()
    assert "X-Custom: val" in echoed
    assert "Accept: text/html" in echoed
    assert "Accept: */*" not in echoed        # custom Accept wins
    assert "Accept-Encoding: gzip" in echoed  # -g


def test_post_content_headers(spark):
    _, rows = _crawl_map(
        spark,
        [{"url": "http://host0.test/headers", "method": "POST", "post": b"a=1"}],
        CrawlSettings(timeout=600),
    )
    echoed = bytes(rows[0]["body"]).decode()
    assert "Content-Length: 3" in echoed
    assert "Content-Type: application/x-www-form-urlencoded" in echoed


# ---------------------------------------------------------------------------
# impatient mode
# ---------------------------------------------------------------------------


def test_impatient_cuts_single_straggler(spark):
    seeds = [f"http://host{i}.test/page/{i}" for i in range(4)] + [
        "http://slow.test/delay/3000"
    ]
    base = dict(timeout=600, delay=0)
    _, patient = _crawl_map(spark, seeds, CrawlSettings(**base))
    assert patient[4]["outcome"] == "done"

    _, rows = _crawl_map(spark, seeds, CrawlSettings(impatient=True, **base))
    assert rows[4]["outcome"] == "timeout"
    assert rows[4]["timeout_reason"] == "HTTP server timed out"
    for i in range(4):
        assert rows[i]["outcome"] == "done"


def test_impatient_leaves_close_finishers(spark):
    # gap under 400ms -> nobody is cut
    seeds = [f"http://host{i}.test/page/{i}" for i in range(4)] + [
        "http://slow.test/delay/300"
    ]
    _, rows = _crawl_map(
        spark, seeds, CrawlSettings(impatient=True, timeout=600, delay=0)
    )
    assert all(r["outcome"] == "done" for r in rows.values())


# ---------------------------------------------------------------------------
# timing + text sink
# ---------------------------------------------------------------------------


def test_timing_struct_populated(spark):
    _, rows = _crawl_map(
        spark,
        ["http://host0.test/delay/50", "http://host0.test/page/1"],
        CrawlSettings(timeout=600),
    )
    t = rows[0]["timing"].asDict()
    assert t["done"] >= 50
    assert t["firstbyte"] >= t["requeststart"] > 0
    assert t["lastread"] == t["firstbyte"]
    assert t["sslstart"] == 0  # http -> no ssl phase


def test_render_output_block(spark):
    res, rows = _crawl_map(
        spark,
        [
            "http://host0.test/redirect/2",
            "http://host2.test/cookies/set?k1=v1",
            "not a url",
        ],
        CrawlSettings(timeout=600),
    )
    blob = to_text(res).decode("utf-8", errors="replace")
    recs = blob.split("Index: ")
    assert len(recs) == 4  # 3 records + leading chunk

    r0 = render_output(res.orderBy("index").collect()[0].asDict()).decode()
    assert r0.startswith("URL: http://host0.test/redirect/2")
    assert "Redirected-To: http://host0.test/get" in r0
    assert r0.count("Redirect-info: ") == 2
    assert "Status: 200" in r0
    assert "\nTiming: " in r0 and "Total=" in r0
    assert "Index: 0" in r0

    r1 = render_output(res.orderBy("index").collect()[1].asDict()).decode()
    assert "Cookies: 1" in r1
    assert "\nk1\tv1" not in r1  # netscape line is domain-first
    assert "host2.test\t1\t/\t0\t" in r1

    r2 = render_output(res.orderBy("index").collect()[2].asDict()).decode()
    assert "Error-msg: Failed to parse URL" in r2
    assert "Status: -10" in r2


def test_format_timing_empty_struct_is_blank():
    assert format_timing({}, 9, 0) == ""
    assert format_timing(None, 9, 0) == ""


def test_netscape_jar_roundtrip():
    from minicrawler_spark.functions.cookies import netscape_line, parse_netscape

    line = "host.test\t1\t/p\t0\t1750000500\tk\tv"
    c = parse_netscape(line)
    assert c == {
        "name": "k", "value": "v", "domain": "host.test", "path": "/p",
        "secure": False, "host_only": True, "expires": 1750000500,
    }
    assert netscape_line(c) == line
