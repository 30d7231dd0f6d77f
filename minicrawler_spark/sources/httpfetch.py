"""Real-network fetcher — the reference's connect/handshake/send/recv
path (crawler.c:588-1318) on stdlib sockets, behind the same fetcher
contract as the fixture web:

    fetch(method, url, headers, body) -> (raw_response_bytes, delay_ms)

Design decisions, mapped to the reference:

- RAW bytes come back (status line + headers + body as read off the
  wire); ALL protocol interpretation — head parse, chunked decode,
  gzip, charset, cookies, redirects — stays in the engine's own
  functions/httpproto.py, exactly like the reference owns its parser.
- DNS: socket.getaddrinfo, IPv4 results first then IPv6 (the
  reference launches A and falls back to AAAA, crawler.c:416-436);
  connect failover walks the list with a per-attempt timeout of
  timeout/3 (>6s total) else 2s (crawler.c:1873-1885).
- TLS: ssl.create_default_context; `insecure=True` disables
  verification (-k, cert.c:333); ALPN pinned to http/1.1 (the h2
  code path is out of scope — SURVEY §2.8).
- We send `Connection: close` and read to EOF: correctness-neutral
  (the engine's Content-Length/chunked logic still applies) but it
  forgoes the reference's same-host-redirect connection reuse —
  a throughput, not semantics, difference; a per-partition keep-alive
  pool is the upgrade path.
- delay_ms is the measured wall time, so the engine's virtual clock
  accumulates real elapsed time; `timeout_s` bounds the whole fetch.

Use from the crawl engine:

    crawl(spark, seeds, CrawlSettings(real_time=True),
          fetcher_spec="minicrawler_spark.sources.httpfetch:http_fetcher")
"""

from __future__ import annotations

import socket
import ssl
import time
from urllib.parse import urlsplit

MAX_RESPONSE = 64 * 1024 * 1024  # hard cap; engine truncates at -m

_DEFAULTS = {"timeout_s": 5.0, "insecure": False, "ipv6_only": False}


def configure(timeout_s: float = 5.0, insecure: bool = False,
              ipv6_only: bool = False) -> None:
    """Process-global knobs, set by the engine per fetch stage
    (resolve_fetcher passes the crawl settings through)."""
    _DEFAULTS["timeout_s"] = timeout_s
    _DEFAULTS["insecure"] = insecure
    _DEFAULTS["ipv6_only"] = ipv6_only


def _resolve(host: str, port: int):
    """IPv4 first, then IPv6 (A -> AAAA fallback order); -6 restricts
    to AAAA (crawler.c MCURL_OPT_IPV6)."""
    infos = socket.getaddrinfo(host, port, type=socket.SOCK_STREAM)
    v4 = [i for i in infos if i[0] == socket.AF_INET]
    v6 = [i for i in infos if i[0] == socket.AF_INET6]
    if _DEFAULTS["ipv6_only"]:
        return v6
    return v4 + v6


def _connect(addrs, total_timeout: float):
    """Non-blocking-style connect failover across resolved addresses:
    per-attempt timeout = total/3 when total > 6 else 2s
    (crawler.c:1873-1885)."""
    per = total_timeout / 3.0 if total_timeout > 6 else 2.0
    last_err = None
    for family, stype, proto, _cname, sockaddr in addrs:
        s = socket.socket(family, stype, proto)
        s.settimeout(min(per, total_timeout))
        try:
            s.connect(sockaddr)
            return s
        except OSError as e:
            last_err = e
            s.close()
    raise last_err or OSError("no addresses")


def http_fetcher(method: str, url: str, headers: dict, body):
    """The fetcher-contract entry point."""
    timeout_s = float(_DEFAULTS["timeout_s"])
    deadline = time.monotonic() + timeout_s
    t0 = time.monotonic()

    parts = urlsplit(url)
    scheme = (parts.scheme or "http").lower()
    host = parts.hostname or ""
    port = parts.port or (443 if scheme == "https" else 80)
    path = parts.path or "/"
    if parts.query:
        path += "?" + parts.query

    addrs = _resolve(host, port)
    sock = _connect(addrs, timeout_s)
    try:
        if scheme == "https":
            ctx = ssl.create_default_context()
            ctx.set_alpn_protocols(["http/1.1"])
            if _DEFAULTS["insecure"]:
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            sock.settimeout(max(0.1, deadline - time.monotonic()))
            sock = ctx.wrap_socket(sock, server_hostname=host)

        lines = ["%s %s HTTP/1.1" % (method, path)]
        sent = {k.lower() for k in headers}
        for k, v in headers.items():
            lines.append("%s: %s" % (k, v))
        if "connection" not in sent:
            lines.append("Connection: close")
        req = ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1")
        if body:
            req += bytes(body)

        sock.settimeout(max(0.1, deadline - time.monotonic()))
        sock.sendall(req)

        chunks = []
        total = 0
        while total < MAX_RESPONSE:
            sock.settimeout(max(0.1, deadline - time.monotonic()))
            data = sock.recv(65536)
            if not data:
                break
            chunks.append(data)
            total += len(data)
        raw = b"".join(chunks)
    finally:
        sock.close()

    delay_ms = int((time.monotonic() - t0) * 1000)
    return raw, delay_ms
