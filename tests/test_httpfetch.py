"""Real-network fetcher (sources/httpfetch.py) driven end-to-end
through the crawl engine against a loopback HTTP server — DNS resolve,
connect, request bytes on a real socket, raw response back through the
engine's own protocol layer (head parse, redirects, cookies, gzip,
chunked, html2text spans)."""

import gzip
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.sources.httpfetch import http_fetcher
from minicrawler_spark.streaming.crawl import crawl

HTML = (b"<html><body><h1>Hi</h1><p>linked <a href='/ok'>here</a></p>"
        b"<img src='/img.png'></body></html>")


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def _send(self, status, ctype, body, extra=()):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/ok" or self.path.startswith("/ok?"):
            self._send(200, "text/plain", b"plain body")
        elif self.path == "/page":
            self._send(200, "text/html; charset=utf-8", HTML)
        elif self.path.startswith("/redirect/"):
            n = int(self.path.rsplit("/", 1)[1])
            loc = "/ok" if n <= 1 else "/redirect/%d" % (n - 1)
            self._send(302, "text/plain", b"", [("Location", loc)])
        elif self.path == "/gzip":
            gz = gzip.compress(b"unzipped payload")
            self._send(200, "text/plain", gz, [("Content-Encoding", "gzip")])
        elif self.path == "/cookie":
            self._send(200, "text/plain", b"c",
                       [("Set-Cookie", "sid=abc; Path=/")])
        elif self.path == "/chunked":
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for part in (b"chun", b"ked!"):
                self.wfile.write(b"%x\r\n%s\r\n" % (len(part), part))
            self.wfile.write(b"0\r\n\r\n")
        elif self.path == "/echo-ua":
            ua = self.headers.get("User-Agent", "")
            self._send(200, "text/plain", ua.encode())
        else:
            self._send(404, "text/plain", b"nope")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self._send(200, "text/plain", b"post:" + body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield "http://127.0.0.1:%d" % srv.server_address[1]
    srv.shutdown()


def test_fetcher_raw_contract(server):
    raw, delay_ms = http_fetcher(
        "GET", server + "/ok", {"Host": "127.0.0.1", "Accept": "*/*"}, None
    )
    assert raw.startswith(b"HTTP/1.1 200")
    assert raw.endswith(b"plain body")
    assert delay_ms >= 0


def test_crawl_over_real_sockets(server, spark):
    seeds = [
        server + "/page",          # 0: html -> spans + links
        server + "/redirect/3",    # 1: real redirect chain
        server + "/gzip",          # 2
        server + "/chunked",       # 3
        server + "/cookie",        # 4
        {"url": server + "/ok", "method": "POST", "post": b"a=1"},  # 5
        server + "/echo-ua",       # 6
        server + "/missing",       # 7: 404 passthrough
    ]
    res = crawl(
        spark,
        seeds,
        CrawlSettings(
            timeout=30, delay=10, real_time=True, customagent="rt-agent/1",
            extract_links=True, max_depth=0,  # spans on, no BFS refetch
        ),
        fetcher_spec="minicrawler_spark.sources.httpfetch:http_fetcher",
    ).cache()
    rows = {r["index"]: r for r in res.collect()}
    assert len(rows) == len(seeds)

    assert rows[0]["status"] == 200
    spans = rows[0]["spans"]
    assert any(s["kind"] == "text" and "Hi" in s["text"] for s in spans)
    assert any(s["kind"] == "media" for s in spans)

    assert rows[1]["status"] == 200
    assert len(rows[1]["redirect_info"]) == 3
    assert rows[1]["redirectedto"].endswith("/ok")
    assert bytes(rows[1]["body"]) == b"plain body"

    assert bytes(rows[2]["body"]) == b"unzipped payload"
    assert bytes(rows[3]["body"]) == b"chunked!"

    cookies = rows[4]["cookies"]
    assert [c["name"] for c in cookies] == ["sid"]
    assert cookies[0]["value"] == "abc"

    assert bytes(rows[5]["body"]) == b"post:a=1"
    assert bytes(rows[6]["body"]) == b"rt-agent/1"
    assert rows[7]["status"] == 404


def test_real_politeness_spacing(server, spark):
    """real_time=True: same-host fetches are spaced by >= delay ms of
    wall clock (politeness enforced for real, not just scheduled)."""
    import time

    seeds = [server + "/ok?i=%d" % i for i in range(4)]
    t0 = time.monotonic()
    res = crawl(
        spark, seeds,
        CrawlSettings(timeout=30, delay=300, real_time=True),
        fetcher_spec="minicrawler_spark.sources.httpfetch:http_fetcher",
    )
    n = res.filter("status = 200").count()
    wall = time.monotonic() - t0
    assert n == 4
    assert wall >= 0.9  # slots 0/300/600/900 ms


def test_connect_refused_maps_to_error(spark):
    res = crawl(
        spark,
        ["http://127.0.0.1:9/x"],  # port 9: nothing listening
        CrawlSettings(timeout=3, real_time=True),
        fetcher_spec="minicrawler_spark.sources.httpfetch:http_fetcher",
    )
    row = res.collect()[0]
    assert row["outcome"] in ("error", "timeout")


def test_keepalive_reuse(server):
    """Same-host requests reuse the pooled connection (the reference's
    crawler.c:1624-1632 reuse); the second response is clean."""
    from minicrawler_spark.sources import httpfetch

    httpfetch._POOL.clear()
    r1, _ = http_fetcher("GET", server + "/ok", {"Host": "x"}, None)
    assert r1.endswith(b"plain body")
    assert len(httpfetch._POOL) == 1
    pooled = next(iter(httpfetch._POOL.values()))
    r2, _ = http_fetcher("GET", server + "/gzip", {"Host": "x"}, None)
    assert r2.startswith(b"HTTP/1.1 200")
    assert next(iter(httpfetch._POOL.values())) is pooled  # same socket
    # chunked framing keeps the socket clean too
    r3, _ = http_fetcher("GET", server + "/chunked", {"Host": "x"}, None)
    assert b"chunked" in r3.lower()
    r4, _ = http_fetcher("GET", server + "/ok", {"Host": "x"}, None)
    assert r4.endswith(b"plain body")


def test_stale_pooled_socket_retries_fresh(server):
    from minicrawler_spark.sources import httpfetch

    httpfetch._POOL.clear()
    r1, _ = http_fetcher("GET", server + "/ok", {"Host": "x"}, None)
    # kill the pooled socket behind the fetcher's back
    key, sock = next(iter(httpfetch._POOL.items()))
    sock.close()
    r2, _ = http_fetcher("GET", server + "/ok", {"Host": "x"}, None)
    assert r2.endswith(b"plain body")
