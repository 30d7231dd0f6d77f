"""Deterministic synthetic web — the hermetic stand-in for httpbin.

`fixture_response(method, url, request_headers, body)` is a pure
function returning a raw HTTP/1.1 response (status line + headers +
body bytes, possibly gzipped/chunked/charset-encoded) plus a virtual
service delay in ms. It reproduces the scenario families of the
reference's integration suite (integration-tests/test_cases.php:2-132)
plus the redirect/robots/timeout fixtures SURVEY.md §5 calls for, so
the whole protocol stack (head parse -> header dispatch -> chunked ->
gzip -> charset -> html2text) is exercised end-to-end without a
network. Any `hostN.test` host serves the same path catalog, so
synthetic frontiers of arbitrary host fan-out are one format string
away (see `synthetic_seeds`).

Paths (query strings significant where noted):
  /                          HTML home: links to /page/0.. + images
  /page/{i}                  HTML: in-host + cross-host links, images
  /get                       plain text echo of method
  /post                      echoes method + body
  /status/{n}                that status, tiny body
  /redirect/{n}              302 relative-Location chain down to /get
  /absolute-redirect/{n}     302 absolute http://host/redirect paths
  /relative-redirect/{n}     302 with bare relative path
  /redirect-loop             302 to itself (redirect-limit test)
  /redirect-to?url=U         302 to U (cross-host tests)
  /refresh/{n}               200 with Refresh: 0;url=...
  /cookies/set?n=v           Set-Cookie n=v + 302 to /cookies
  /cookies                   body lists received Cookie header
  /basic-auth/{u}/{p}        401 Basic challenge / 200 on good creds
  /digest-auth/auth/{u}/{p}  401 Digest (fixed nonce) / 200 verified
  /gzip                      gzipped HTML body + Content-Encoding
  /chunked                   Transfer-Encoding: chunked body
  /charset/{cs}              body in that charset, meta-declared only
  /headers-charset/{cs}      charset declared in Content-Type header
  /delay/{ms}                adds virtual delay
  /teapot                    418 with body (status passthrough test)
  /image/{name}              binary blob (media fetch)
  /robots.txt                deterministic robots rules per host
  /huge                      3 MiB body (max-page-size truncation)
  /head-no-follow            302; HEAD requests must not follow
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import re
from typing import Optional
from urllib.parse import parse_qs, unquote, urlsplit

from ..functions.httpproto import _CNONCE, _NC, _md5hex

__all__ = ["fixture_response", "fixture_fetcher", "synthetic_seeds", "FIXED_NONCE"]

FIXED_NONCE = "f1x3dn0nc3deadbeef"
_REALM = "Fake Realm"


def _h(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _tiny_png(seed: int) -> bytes:
    """A VALID deterministic 8x8 RGB PNG (filter 0, pixels from the
    seed's sha256 stream) so the media loop — crawl -> WARC ->
    warc_to_media -> decode_pixels — recovers real samples end to
    end. Pure function of seed; ~120 bytes."""
    import struct
    import zlib

    px = bytearray()
    stream = hashlib.sha256(b"px%d" % seed).digest()
    while len(px) < 8 * 8 * 3:
        px += stream
        stream = hashlib.sha256(stream).digest()
    raw = bytearray()
    for y in range(8):
        raw.append(0)
        raw += px[y * 24:(y + 1) * 24]

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)
                              & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _tiny_wav(seed: int) -> bytes:
    """A VALID deterministic mono 16-bit 8 kHz WAV (400 samples from
    the seed's sha256 stream) so the audio loop — crawl -> WARC ->
    warc_to_media -> decode_audio -> audio_features — runs on real
    PCM end to end. Pure function of seed; ~850 bytes."""
    import struct

    raw = bytearray()
    stream = hashlib.sha256(b"pcm%d" % seed).digest()
    while len(raw) < 400 * 2:
        raw += stream
        stream = hashlib.sha256(stream).digest()
    pcm = bytes(raw[:400 * 2])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def _tiny_mp4(seed: int) -> bytes:
    """A VALID deterministic MP4 with REAL sample tables (ISO/IEC
    14496-12): three video samples (opaque payload bytes from the
    seed hash) split over two chunks, sync samples 1 and 3 — enough
    for probe_av AND sample_frames to walk the container through the
    archive path. mdat precedes moov so chunk offsets are static."""
    import struct

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    def full(tag, body):
        return box(tag, b"\x00\x00\x00\x00" + body)

    pays = [hashlib.sha256(b"frame%d:%d" % (seed, i)).digest()[:10 + i]
            for i in range(3)]
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isommp42")
    mdat = box(b"mdat", b"".join(pays))
    base = len(ftyp) + 8
    stsd = full(b"stsd", struct.pack(">I", 1) + box(b"avc1", b"\x00" * 78))
    stts = full(b"stts", struct.pack(">III", 1, 3, 200))
    stss = full(b"stss", struct.pack(">III", 2, 1, 3))
    stsc = full(b"stsc", struct.pack(">I", 2)
                + struct.pack(">III", 1, 2, 1)
                + struct.pack(">III", 2, 1, 1))
    stsz = full(b"stsz", struct.pack(">II", 0, 3)
                + b"".join(struct.pack(">I", len(p)) for p in pays))
    stco = full(b"stco", struct.pack(">III", 2, base,
                                     base + sum(len(p)
                                                for p in pays[:2])))
    stbl = box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    mdhd = full(b"mdhd", b"\x00" * 8 + struct.pack(">II", 600, 600)
                + b"\x00" * 4)
    hdlr = full(b"hdlr", b"\x00\x00\x00\x00" + b"vide" + b"\x00" * 12)
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    tkhd = full(b"tkhd", b"\x00" * 72
                + struct.pack(">II", 64 << 16, 48 << 16))
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", b"\x00" * 8 + struct.pack(">II", 600, 600)
                + b"\x00" * 80)
    return ftyp + mdat + box(b"moov", mvhd + trak)


def _resp(status: int, headers: list, body: bytes = b"", reason: str = "OK") -> bytes:
    out = "HTTP/1.1 %d %s\r\n" % (status, reason)
    hs = list(headers)
    if not any(h[0].lower() == "content-length" for h in hs) and not any(
        h[0].lower() == "transfer-encoding" for h in hs
    ):
        hs.append(("Content-Length", str(len(body))))
    for name, value in hs:
        out += "%s: %s\r\n" % (name, value)
    return out.encode("latin-1") + b"\r\n" + body


def _page_html(host: str, i: int, n_hosts: int = 8, fanout: int = 3) -> bytes:
    """Deterministic page with in-host and cross-host links + images."""
    seed = _h("%s/%d" % (host, i))
    links = []
    for k in range(fanout):
        links.append("/page/%d" % ((seed + k * 7 + i + 1) % 50))
    m = re.match(r"host(\d+)\.test", host)
    if m:
        other = (int(m.group(1)) + i + 1) % n_hosts
        links.append("http://host%d.test/page/%d" % (other, seed % 50))
    imgs = ["/image/im%d.png" % (seed % 9), "/image/im%d.png" % ((seed + 1) % 9)]
    body = ["<html><head><title>Page %d on %s</title></head><body>" % (i, host)]
    body.append("<h1>Page %d</h1>" % i)
    filler_words = [
        "crawl", "frontier", "index", "fetch", "parse", "token", "shard",
        "queue", "robots", "anchor", "render", "cache", "delta", "batch",
    ]
    for j, l in enumerate(links):
        filler = " ".join(
            filler_words[(seed >> (j + k)) % len(filler_words)]
            + str((seed >> k) % 97)
            for k in range(120)
        )
        body.append('<p>para %d with <a href="%s">link %d</a> and %s</p>'
                    % (j, l, j, filler))
    for img in imgs:
        body.append('<img src="%s">' % img)
    body.append("<table><tr><td>cell&nbsp;A</td><td>caf&eacute;</td></tr></table>")
    body.append("</body></html>")
    return "".join(body).encode()


def fixture_response(
    method: str,
    url: str,
    request_headers: Optional[dict] = None,
    body: Optional[bytes] = None,
):
    """Returns (raw_response_bytes, delay_ms). Pure function."""
    req = {k.lower(): v for k, v in (request_headers or {}).items()}
    parts = urlsplit(url)
    host = parts.hostname or ""
    path = parts.path or "/"
    query = parse_qs(parts.query)
    delay = 0

    def html(b, extra=()):
        return _resp(200, [("Content-Type", "text/html; charset=utf-8"), *extra], b)

    if path == "/":
        return html(_page_html(host, 0)), delay

    m = re.match(r"^/page/(\d+)$", path)
    if m:
        return html(_page_html(host, int(m.group(1)))), delay

    if path == "/get":
        return _resp(200, [("Content-Type", "text/plain")],
                     ("method=%s host=%s" % (method, host)).encode()), delay

    if path == "/headers":
        # echo of received request headers (original casing), sorted,
        # one per line (the httpbin /headers analogue)
        orig = request_headers or {}
        lines = "".join(
            "%s: %s\n" % (k, orig[k]) for k in sorted(orig, key=str.lower)
        )
        return _resp(200, [("Content-Type", "text/plain")],
                     lines.encode()), delay

    if path == "/post":
        b = body or b""
        return _resp(200, [("Content-Type", "text/plain")],
                     ("method=%s len=%d body=" % (method, len(b))).encode() + b), delay

    m = re.match(r"^/status/(\d+)$", path)
    if m:
        code = int(m.group(1))
        return _resp(code, [("Content-Type", "text/plain")],
                     b"status body %d" % code, reason="X"), delay

    if path == "/teapot":
        return _resp(418, [("Content-Type", "text/plain")],
                     b"I'm a teapot", reason="I'M A TEAPOT"), delay

    m = re.match(r"^/redirect/(\d+)$", path)
    if m:
        n = int(m.group(1))
        loc = "/get" if n <= 1 else "/redirect/%d" % (n - 1)
        return _resp(302, [("Location", loc)], reason="FOUND"), delay

    m = re.match(r"^/absolute-redirect/(\d+)$", path)
    if m:
        n = int(m.group(1))
        loc = ("http://%s/get" % host) if n <= 1 else (
            "http://%s/absolute-redirect/%d" % (host, n - 1))
        return _resp(302, [("Location", loc)], reason="FOUND"), delay

    m = re.match(r"^/relative-redirect/(\d+)$", path)
    if m:
        # bare relative Locations exercise WHATWG relative resolution:
        # "7" resolves against /relative-redirect/8 -> /relative-redirect/7
        n = int(m.group(1))
        loc = "../get" if n <= 1 else str(n - 1)
        return _resp(302, [("Location", loc)], reason="FOUND"), delay

    if path == "/redirect-loop":
        return _resp(302, [("Location", "/redirect-loop")], reason="FOUND"), delay

    if path == "/redirect-to":
        target = query.get("url", ["/get"])[0]
        return _resp(302, [("Location", target)], reason="FOUND"), delay

    m = re.match(r"^/refresh/(\d+)$", path)
    if m:
        n = int(m.group(1))
        loc = "/get" if n <= 1 else "/refresh/%d" % (n - 1)
        return _resp(200, [("Refresh", "0;url=%s" % loc),
                           ("Content-Type", "text/html")],
                     b"<html>refreshing</html>"), delay

    if path == "/head-no-follow":
        return _resp(302, [("Location", "/get")], b"", reason="FOUND"), delay

    if path == "/cookies/set":
        hdrs = [("Location", "/cookies")]
        for name, values in sorted(query.items()):
            for v in values:
                hdrs.append(("Set-Cookie", "%s=%s; Path=/" % (name, v)))
        return _resp(302, hdrs, reason="FOUND"), delay

    if path == "/cookies/set-domain":
        # domain cookie + one the client must reject
        return _resp(302, [
            ("Location", "/cookies"),
            ("Set-Cookie", "dc=1; Domain=.%s; Path=/" % host),
            ("Set-Cookie", "evil=1; Domain=evil.example"),
            ("Set-Cookie", "short=1; Max-Age=1"),
        ], reason="FOUND"), delay

    if path == "/cookies":
        sent = req.get("cookie", "")
        return _resp(200, [("Content-Type", "text/plain")],
                     ("cookies=[%s]" % sent).encode()), delay

    m = re.match(r"^/basic-auth/([^/]+)/([^/]+)$", path)
    if m:
        user, pwd = unquote(m.group(1)), unquote(m.group(2))
        import base64 as b64
        expect = "Basic " + b64.b64encode(
            ("%s:%s" % (user, pwd)).encode()).decode()
        if req.get("authorization") == expect:
            return _resp(200, [("Content-Type", "text/plain")],
                         b"authenticated basic " + user.encode()), delay
        return _resp(401, [("WWW-Authenticate", 'Basic realm="%s"' % _REALM)],
                     b"", reason="UNAUTHORIZED"), delay

    m = re.match(r"^/digest-auth/auth/([^/]+)/([^/]+)$", path)
    if m:
        user, pwd = unquote(m.group(1)), unquote(m.group(2))
        auth = req.get("authorization", "")
        if auth.startswith("Digest "):
            fields = {
                k: (a if a else b)
                for k, a, b in re.findall(r'(\w+)=(?:"([^"]*)"|([^",\s]+))', auth[7:])
            }
            ha1 = _md5hex(("%s:%s:%s" % (user, _REALM, pwd)).encode())
            ha2 = _md5hex(("%s:%s" % (method, fields.get("uri", ""))).encode())
            expect = _md5hex((
                "%s:%s:%s:%s:%s:%s" % (ha1, FIXED_NONCE, _NC, _CNONCE, "auth", ha2)
            ).encode())
            if fields.get("response") == expect and fields.get("username") == user:
                return _resp(200, [("Content-Type", "text/plain")],
                             b"authenticated digest " + user.encode()), delay
        return _resp(401, [(
            "WWW-Authenticate",
            'Digest realm="%s", nonce="%s", qop="auth", algorithm=MD5'
            % (_REALM, FIXED_NONCE),
        )], b"", reason="UNAUTHORIZED"), delay

    if path == "/gzip":
        raw = _page_html(host, 999)
        gz = _gzip.compress(raw, compresslevel=6, mtime=0)
        return _resp(200, [("Content-Type", "text/html; charset=utf-8"),
                           ("Content-Encoding", "gzip")], gz), delay

    if path == "/chunked":
        raw = b"<html><body>" + b"<p>chunk data</p>" * 40 + b"</body></html>"
        chunks = b""
        pos = 0
        sizes = [7, 64, 13, 128, 256]
        k = 0
        while pos < len(raw):
            n = sizes[k % len(sizes)]
            piece = raw[pos : pos + n]
            chunks += ("%x\r\n" % len(piece)).encode() + piece + b"\r\n"
            pos += n
            k += 1
        chunks += b"0\r\n\r\ntrailing-garbage-to-discard"
        return _resp(200, [("Content-Type", "text/html"),
                           ("Transfer-Encoding", "chunked")], chunks), delay

    m = re.match(r"^/charset/([\w-]+)$", path)
    if m:
        cs = m.group(1)
        text = "<html><meta http-equiv=\"Content-Type\" content=\"text/html; charset=%s\"><body>žluťoučký kůň</body></html>" % cs
        try:
            b = text.encode(cs, errors="ignore")
        except LookupError:
            b = text.encode("utf-8")
        return _resp(200, [("Content-Type", "text/html")], b), delay

    m = re.match(r"^/headers-charset/([\w-]+)$", path)
    if m:
        cs = m.group(1)
        text = "<html><body>žluťoučký kůň über</body></html>"
        try:
            b = text.encode(cs, errors="ignore")
        except LookupError:
            b = text.encode("utf-8")
        return _resp(200, [("Content-Type", "text/html; charset=%s" % cs)], b), delay

    m = re.match(r"^/delay/(\d+)$", path)
    if m:
        delay = int(m.group(1))
        return _resp(200, [("Content-Type", "text/plain")],
                     b"slow response"), delay

    m = re.match(r"^/image/(\w+)\.png$", path)
    if m:
        seed = _h(m.group(1))
        return _resp(200, [("Content-Type", "image/png")],
                     _tiny_png(seed)), delay

    m = re.match(r"^/audio/(\w+)\.wav$", path)
    if m:
        return _resp(200, [("Content-Type", "audio/wav")],
                     _tiny_wav(_h(m.group(1)))), delay

    m = re.match(r"^/video/(\w+)\.mp4$", path)
    if m:
        return _resp(200, [("Content-Type", "video/mp4")],
                     _tiny_mp4(_h(m.group(1)))), delay

    if path == "/robots.txt":
        seed = _h(host)
        lines = ["User-agent: *"]
        lines.append("Disallow: /private%d/" % (seed % 10))
        if seed % 3 == 0:
            lines.append("Disallow: /page/%d" % (seed % 50))
        if seed % 4 == 0:
            lines.append("Crawl-delay: %d" % (1 + seed % 3))
        return _resp(200, [("Content-Type", "text/plain")],
                     "\n".join(lines).encode()), delay

    if path == "/huge":
        raw = (b"x" * 1023 + b"\n") * (3 * 1024)  # 3 MiB
        return _resp(200, [("Content-Type", "text/plain")], raw), delay

    if path == "/empty":
        return _resp(200, [], b""), delay

    if path == "/no-content-length":
        out = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody until EOF"
        return out, delay

    if path == "/bad-status-line":
        return b"ICY 200 OK\r\n\r\nnope", delay

    return _resp(404, [("Content-Type", "text/plain")], b"not found",
                 reason="NOT FOUND"), delay


def fixture_fetcher(method: str, url: str, request_headers: dict, body):
    """Fetcher-protocol adapter: (raw_response_bytes, delay_ms)."""
    return fixture_response(method, url, request_headers, body)


def synthetic_seeds(n_hosts: int = 8, pages_per_host: int = 1):
    """Deterministic seed list over the fixture web."""
    seeds = []
    for h in range(n_hosts):
        for p in range(pages_per_host):
            seeds.append("http://host%d.test/page/%d" % (h, p))
    return seeds
