"""Async DNS resolver (sources/adns.py): RFC 1035 packet build/parse
(incl. name compression and CNAME chains), a loopback UDP nameserver
integration, and the _alookup wiring — TTL-honoring cache, literal
short-circuit, getaddrinfo fallback, and the health gate."""

import asyncio
import socket
import struct
import threading

import pytest

from minicrawler_spark.sources import adns
from minicrawler_spark.sources.adns import (
    DnsError,
    build_query,
    parse_response,
    resolve_async,
)


def _answer(qdata: bytes, records, rcode=0, tc=False):
    """Craft a response to query bytes `qdata`: echo the question,
    then `records` = [(rtype, ttl, rdata)] with compression pointers
    back to the question name (0xC00C)."""
    qid = struct.unpack(">H", qdata[:2])[0]
    flags = 0x8180 | rcode | (0x0200 if tc else 0)
    head = struct.pack(">HHHHHH", qid, flags, 1, len(records), 0, 0)
    question = qdata[12:]  # name + type + class, verbatim echo
    body = b""
    for rtype, ttl, rdata in records:
        body += (b"\xc0\x0c"
                 + struct.pack(">HHIH", rtype, 1, ttl, len(rdata))
                 + rdata)
    return head + question + body


class _LoopbackNS:
    """Tiny UDP nameserver: answers from a {(name, qtype): response
    factory} table; counts queries (thread, ephemeral port)."""

    def __init__(self, table):
        self.table = table
        self.queries = []
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.addr = self.sock.getsockname()
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while True:
            try:
                data, client = self.sock.recvfrom(4096)
            except OSError:
                return
            # decode qname + qtype
            pos, labels = 12, []
            while data[pos]:
                labels.append(data[pos + 1:pos + 1 + data[pos]].decode())
                pos += 1 + data[pos]
            qtype = struct.unpack(">H", data[pos + 1:pos + 3])[0]
            name = ".".join(labels)
            self.queries.append((name, qtype))
            fn = self.table.get((name, qtype))
            if fn is None:
                self.sock.sendto(_answer(data, [], rcode=3), client)
            else:
                self.sock.sendto(fn(data), client)

    def close(self):
        self.sock.close()


def test_build_query_layout():
    q = build_query(0x1234, "a.example.test", adns._TYPE_A)
    assert q[:2] == b"\x12\x34"
    assert q[2:4] == b"\x01\x00"  # RD
    assert q[12:] == (b"\x01a\x07example\x04test\x00"
                      + struct.pack(">HH", 1, 1))


def test_parse_response_compression_and_cname():
    q = build_query(7, "www.example.test", adns._TYPE_A)
    resp = _answer(q, [
        (adns._TYPE_CNAME, 60, b"\x04real\xc0\x10"),  # skipped
        (adns._TYPE_A, 120, socket.inet_aton("10.1.2.3")),
        (adns._TYPE_A, 90, socket.inet_aton("10.1.2.4")),
    ])
    rcode, tc, recs = parse_response(resp, 7, adns._TYPE_A)
    assert rcode == 0 and not tc
    assert [(t, socket.inet_ntoa(r)) for t, r in recs] == [
        (120, "10.1.2.3"), (90, "10.1.2.4")
    ]
    with pytest.raises(DnsError):
        parse_response(resp, 8, adns._TYPE_A)  # id mismatch
    with pytest.raises(DnsError):
        parse_response(resp[:10], 7, adns._TYPE_A)  # short


def test_resolve_async_against_loopback_ns():
    ns = _LoopbackNS({
        ("dual.test", adns._TYPE_A): lambda q: _answer(
            q, [(adns._TYPE_A, 120, socket.inet_aton("10.0.0.1"))]
        ),
        ("dual.test", adns._TYPE_AAAA): lambda q: _answer(
            q, [(adns._TYPE_AAAA, 60,
                 socket.inet_pton(socket.AF_INET6, "fd00::1"))]
        ),
        ("v4only.test", adns._TYPE_A): lambda q: _answer(
            q, [(adns._TYPE_A, 300, socket.inet_aton("10.0.0.2"))]
        ),
        ("v4only.test", adns._TYPE_AAAA): lambda q: _answer(q, []),
    })
    try:
        infos, ttl = asyncio.run(_resolve_on(ns, "dual.test"))
        fams = sorted(i[0] for i in infos)
        assert socket.AF_INET in fams and socket.AF_INET6 in fams
        assert ttl == 60  # min across answers
        ips = {i[4][0] for i in infos}
        assert ips == {"10.0.0.1", "fd00::1"}

        infos, ttl = asyncio.run(_resolve_on(ns, "v4only.test"))
        assert [i[4][0] for i in infos] == ["10.0.0.2"] and ttl == 300

        with pytest.raises(DnsError):
            asyncio.run(_resolve_on(ns, "missing.test"))
    finally:
        ns.close()


async def _resolve_on(ns, host):
    # the loopback server listens on an ephemeral port, so point a
    # patched _query_once at it rather than port 53
    real = adns._query_once

    async def patched(h, qtype, _ns, timeout, qid):
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        transport, _ = await loop.create_datagram_endpoint(
            lambda: adns._QueryProtocol(fut), remote_addr=ns.addr
        )
        try:
            transport.sendto(build_query(qid, h, qtype))
            data = await asyncio.wait_for(fut, timeout)
        finally:
            transport.close()
        return parse_response(data, qid, qtype)

    adns._query_once = patched
    try:
        return await resolve_async(host, timeout=2.0)
    finally:
        adns._query_once = real


def test_truncated_answer_raises_tc():
    ns = _LoopbackNS({
        ("big.test", adns._TYPE_A): lambda q: _answer(
            q, [(adns._TYPE_A, 30, socket.inet_aton("10.9.9.9"))],
            tc=True,
        ),
        ("big.test", adns._TYPE_AAAA): lambda q: _answer(q, []),
    })
    try:
        with pytest.raises(DnsError, match="truncated"):
            asyncio.run(_resolve_on(ns, "big.test"))
    finally:
        ns.close()


def test_alookup_uses_async_resolver_and_honors_ttl(monkeypatch):
    from minicrawler_spark.sources import httpfetch as hf

    ns = _LoopbackNS({
        ("cached.test", adns._TYPE_A): lambda q: _answer(
            q, [(adns._TYPE_A, 42, socket.inet_aton("10.5.5.5"))]
        ),
        ("cached.test", adns._TYPE_AAAA): lambda q: _answer(q, []),
    })
    real = adns._query_once

    async def patched(h, qtype, _nsrv, timeout, qid):
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        transport, _ = await loop.create_datagram_endpoint(
            lambda: adns._QueryProtocol(fut), remote_addr=ns.addr
        )
        try:
            transport.sendto(build_query(qid, h, qtype))
            data = await asyncio.wait_for(fut, timeout)
        finally:
            transport.close()
        return parse_response(data, qid, qtype)

    monkeypatch.setattr(adns, "_query_once", patched)
    hf._DNS_CACHE.clear()
    hf._ADNS_STATE.update(fails=0, disabled=False)
    try:
        import time as _time

        t0 = _time.monotonic()
        infos = asyncio.run(hf._alookup("cached.test"))
        assert infos[0][4][0] == "10.5.5.5"
        # TTL (42 s) flowed into the cache, not the fixed 300 s
        _entry, expiry = hf._DNS_CACHE["cached.test"]
        assert 35 <= expiry - t0 <= 45
        # second lookup is served from cache: no new server queries
        n_q = len(ns.queries)
        assert asyncio.run(
            hf._alookup("cached.test")
        )[0][4][0] == "10.5.5.5"
        assert len(ns.queries) == n_q

        # IP literals never touch the resolver
        lit = asyncio.run(hf._alookup("127.0.0.1"))
        assert lit[0][4][0] == "127.0.0.1"
        assert len(ns.queries) == n_q
    finally:
        ns.close()
        hf._DNS_CACHE.clear()


def test_alookup_falls_back_and_health_gates(monkeypatch):
    """Transport failures fall back to getaddrinfo and, after 3 in a
    row, disable the async resolver for the process; NXDOMAIN-style
    answers fall back too (to catch /etc/hosts names) but never
    count against the resolver's health."""
    from minicrawler_spark.sources import httpfetch as hf

    calls = {"n": 0}

    async def timeout_resolver(host, timeout=3.0, nameserver=None):
        calls["n"] += 1
        raise asyncio.TimeoutError("dead nameserver")

    monkeypatch.setattr(adns, "resolve_async", timeout_resolver)
    # the stub resolver only sees DOTTED names that are not pinned in
    # /etc/hosts (ADVICE r5: hosts-file precedence + dotless names go
    # to getaddrinfo for search domains — precedence is covered by
    # test_httpfetch.test_etc_hosts_wins_over_stub_resolver), so use
    # a dotted test name and stub the loop-level getaddrinfo fallback
    monkeypatch.setattr(hf, "_etc_hosts_infos", lambda host: None)

    async def fake_gai(self, host, port, **kw):
        import socket

        return [(socket.AF_INET, socket.SOCK_STREAM, 6, "",
                 ("127.0.0.1", 0))]

    monkeypatch.setattr(
        asyncio.base_events.BaseEventLoop, "getaddrinfo", fake_gai
    )
    hf._DNS_CACHE.clear()
    hf._ADNS_STATE.update(fails=0, disabled=False)
    try:
        for i in range(4):
            hf._DNS_CACHE.clear()
            infos = asyncio.run(hf._alookup("stub.test"))
            assert any(i[4][0] in ("127.0.0.1", "::1") for i in infos)
        # 3 transport failures disabled it; the 4th never called
        assert hf._ADNS_STATE["disabled"] is True
        assert calls["n"] == 3

        # NXDOMAIN answers keep the resolver enabled
        async def nx_resolver(host, timeout=3.0, nameserver=None):
            calls["n"] += 1
            raise DnsError("DNS: NXDOMAIN")

        monkeypatch.setattr(adns, "resolve_async", nx_resolver)
        hf._ADNS_STATE.update(fails=0, disabled=False)
        hf._DNS_CACHE.clear()
        infos = asyncio.run(hf._alookup("stub.test"))
        assert any(i[4][0] in ("127.0.0.1", "::1") for i in infos)
        assert hf._ADNS_STATE["disabled"] is False
        assert hf._ADNS_STATE["fails"] == 0
    finally:
        hf._DNS_CACHE.clear()
        hf._ADNS_STATE.update(fails=0, disabled=False)
