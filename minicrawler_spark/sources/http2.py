"""Minimal HTTP/2 client — the reference's nghttp2 path
(/root/reference/src/crawler.c:892-1290) rebuilt for the fetcher:
pure-Python RFC 9113 framing + flow control, with HPACK delegated to
the same libnghttp2 C library the reference links (ctypes binding of
the public nghttp2_hd_* codec API) when the shared library is
loadable, and to the pure-Python RFC 7541 codec (hpack_py.py)
otherwise — so unlike the reference's `#ifdef HAVE_LIBNGHTTP2`
build gate, h2 stays available on every deployment.

Scope mirrors the reference exactly: one request stream at a time per
connection (crawler.c keeps a single stream_id per job), stream ids
1, 3, 5... on reuse, SETTINGS {MAX_CONCURRENT_STREAMS: 100} at
session start (http2_create_session, crawler.c:1152-1156), request
pseudo-headers :method/:scheme/:authority/:path followed by the same
header set as genrequest (genrequest_http2, crawler.c:1181-1248).

The response is synthesized into HTTP/1.1-style raw bytes —
`HTTP/1.1 {status}\\r\\n` + `name: value\\r\\n` lines + body — exactly
the shape the reference writes into its buffer from the h2 callbacks
(http2_on_header_callback writes `name: value` text lines,
crawler.c:957-965; :status feeds u->status, crawler.c:1329-1331), so
the engine's own protocol layer (functions/httpproto.py) stays the
single semantic authority for cookies/redirects/auth/gzip.

Not implemented, by scope: server push (disabled via
SETTINGS_ENABLE_PUSH=0), priorities, more than one concurrent stream
per connection (the engine's concurrency comes from the fetch-stage
multiplexer).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import time
from typing import List, Optional, Tuple

from .hpack_py import (
    HpackError as _HpackError,
    PyHpackDecoder as _PyHpackDecoder,
    PyHpackEncoder as _PyHpackEncoder,
)

__all__ = [
    "hpack_available",
    "HpackDecoder",
    "HpackEncoder",
    "H2Connection",
    "AsyncH2Connection",
    "H2Error",
]


class H2Error(Exception):
    pass


# ---------------------------------------------------------------------------
# HPACK via libnghttp2 (ctypes) — decode needs the full static table +
# Huffman codes, which the C library owns authoritatively
# ---------------------------------------------------------------------------


class _NV(ctypes.Structure):
    _fields_ = [
        ("name", ctypes.POINTER(ctypes.c_uint8)),
        ("value", ctypes.POINTER(ctypes.c_uint8)),
        ("namelen", ctypes.c_size_t),
        ("valuelen", ctypes.c_size_t),
        ("flags", ctypes.c_uint8),
    ]


_NGHTTP2 = None
_HD_INFLATE_FINAL = 0x01  # nghttp2.h: NGHTTP2_HD_INFLATE_FINAL
_HD_INFLATE_EMIT = 0x02   # nghttp2.h: NGHTTP2_HD_INFLATE_EMIT


def _load_nghttp2():
    global _NGHTTP2
    if _NGHTTP2 is not None:
        return _NGHTTP2
    name = ctypes.util.find_library("nghttp2")
    candidates = [name] if name else []
    candidates += ["libnghttp2.so.14", "libnghttp2.so"]
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        try:
            lib.nghttp2_hd_inflate_new.argtypes = [
                ctypes.POINTER(ctypes.c_void_p)
            ]
            lib.nghttp2_hd_inflate_new.restype = ctypes.c_int
            lib.nghttp2_hd_inflate_hd2.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_NV),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.c_int,
            ]
            lib.nghttp2_hd_inflate_hd2.restype = ctypes.c_ssize_t
            lib.nghttp2_hd_inflate_end_headers.argtypes = [ctypes.c_void_p]
            lib.nghttp2_hd_inflate_del.argtypes = [ctypes.c_void_p]
            lib.nghttp2_hd_deflate_new.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_size_t
            ]
            lib.nghttp2_hd_deflate_new.restype = ctypes.c_int
            lib.nghttp2_hd_deflate_bound.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(_NV), ctypes.c_size_t
            ]
            lib.nghttp2_hd_deflate_bound.restype = ctypes.c_size_t
            lib.nghttp2_hd_deflate_hd.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_size_t, ctypes.POINTER(_NV), ctypes.c_size_t,
            ]
            lib.nghttp2_hd_deflate_hd.restype = ctypes.c_ssize_t
            lib.nghttp2_hd_deflate_del.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _NGHTTP2 = lib
        return lib
    _NGHTTP2 = False
    return False


def hpack_available() -> bool:
    """h2 is always offerable: HPACK comes from libnghttp2 (ctypes)
    when the shared library is present — the codec the reference
    links — with the pure-Python RFC 7541 codec (hpack_py.py) as the
    fallback, so a deployment without libnghttp2.so no longer loses
    h2 silently."""
    return True


def HpackDecoder():
    """Pick the HPACK inflater: libnghttp2 when loadable, else the
    pure-Python RFC 7541 implementation."""
    if _load_nghttp2():
        return _NgHpackDecoder()
    return _PyHpackDecoderAdapter()


def HpackEncoder():
    if _load_nghttp2():
        return _NgHpackEncoder()
    return _PyHpackEncoder()


class _PyHpackDecoderAdapter:
    """hpack_py decoder surfacing malformed blocks as H2Error (what
    the connection layer and the fetcher's fallback path expect)."""

    def __init__(self):
        self._d = _PyHpackDecoder()

    def decode(self, block: bytes) -> List[Tuple[bytes, bytes]]:
        try:
            return self._d.decode(block)
        except _HpackError as e:
            raise H2Error("HPACK: %s" % e)


class _NgHpackDecoder:
    """Streaming inflater over one connection's header blocks."""

    def __init__(self):
        lib = _load_nghttp2()
        if not lib:
            raise H2Error("libnghttp2 not available")
        self._lib = lib
        self._p = ctypes.c_void_p()
        rv = lib.nghttp2_hd_inflate_new(ctypes.byref(self._p))
        if rv != 0:
            raise H2Error("nghttp2_hd_inflate_new: %d" % rv)

    def decode(self, block: bytes) -> List[Tuple[bytes, bytes]]:
        lib = self._lib
        buf = (ctypes.c_uint8 * len(block)).from_buffer_copy(block)
        pos, total = 0, len(block)
        out: List[Tuple[bytes, bytes]] = []
        nv = _NV()
        flags = ctypes.c_int(0)
        while True:
            rv = lib.nghttp2_hd_inflate_hd2(
                self._p, ctypes.byref(nv), ctypes.byref(flags),
                ctypes.cast(
                    ctypes.byref(buf, pos), ctypes.POINTER(ctypes.c_uint8)
                ),
                total - pos, 1,
            )
            if rv < 0:
                raise H2Error("HPACK inflate error %d" % rv)
            pos += rv
            if flags.value & _HD_INFLATE_EMIT:
                out.append(
                    (
                        ctypes.string_at(nv.name, nv.namelen),
                        ctypes.string_at(nv.value, nv.valuelen),
                    )
                )
            if flags.value & _HD_INFLATE_FINAL:
                lib.nghttp2_hd_inflate_end_headers(self._p)
                break
            if rv == 0 and not (flags.value & _HD_INFLATE_EMIT):
                raise H2Error("HPACK inflate stalled")
        return out

    def __del__(self):
        try:
            if getattr(self, "_p", None):
                self._lib.nghttp2_hd_inflate_del(self._p)
        except Exception:
            pass


class _NgHpackEncoder:
    """Header-block deflater (same C codec; used for requests and by
    the test server)."""

    def __init__(self, max_table: int = 4096):
        lib = _load_nghttp2()
        if not lib:
            raise H2Error("libnghttp2 not available")
        self._lib = lib
        self._p = ctypes.c_void_p()
        rv = lib.nghttp2_hd_deflate_new(ctypes.byref(self._p), max_table)
        if rv != 0:
            raise H2Error("nghttp2_hd_deflate_new: %d" % rv)

    def encode(self, headers: List[Tuple[bytes, bytes]]) -> bytes:
        lib = self._lib
        nva = (_NV * len(headers))()
        keep = []  # hold buffers alive through the call
        for i, (n, v) in enumerate(headers):
            nb = ctypes.create_string_buffer(n, len(n))
            vb = ctypes.create_string_buffer(v, len(v))
            keep.append((nb, vb))
            nva[i].name = ctypes.cast(nb, ctypes.POINTER(ctypes.c_uint8))
            nva[i].value = ctypes.cast(vb, ctypes.POINTER(ctypes.c_uint8))
            nva[i].namelen = len(n)
            nva[i].valuelen = len(v)
            nva[i].flags = 0
        bound = lib.nghttp2_hd_deflate_bound(self._p, nva, len(headers))
        out = (ctypes.c_uint8 * bound)()
        rv = lib.nghttp2_hd_deflate_hd(self._p, out, bound, nva, len(headers))
        if rv < 0:
            raise H2Error("HPACK deflate error %d" % rv)
        return bytes(bytearray(out[:rv]))

    def __del__(self):
        try:
            if getattr(self, "_p", None):
                self._lib.nghttp2_hd_deflate_del(self._p)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# RFC 9113 framing
# ---------------------------------------------------------------------------

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

F_DATA = 0x0
F_HEADERS = 0x1
F_PRIORITY = 0x2
F_RST_STREAM = 0x3
F_SETTINGS = 0x4
F_PUSH_PROMISE = 0x5
F_PING = 0x6
F_GOAWAY = 0x7
F_WINDOW_UPDATE = 0x8
F_CONTINUATION = 0x9

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

SETTINGS_ENABLE_PUSH = 0x2
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5

DEFAULT_WINDOW = 65535
DEFAULT_MAX_FRAME = 16384


def pack_frame(ftype: int, flags: int, stream_id: int,
               payload: bytes = b"") -> bytes:
    return (
        struct.pack(">I", len(payload))[1:]
        + bytes((ftype, flags))
        + struct.pack(">I", stream_id & 0x7FFFFFFF)
        + payload
    )


class H2Connection:
    """One HTTP/2 connection over an already-TLS'd (ALPN h2) socket.
    Single in-flight stream, ids 1,3,5,... (the reference's per-job
    session shape)."""

    def __init__(self, sock):
        self.sock = sock
        self.decoder = HpackDecoder()
        self.encoder = HpackEncoder()
        self.next_stream = 1
        self.peer_max_frame = DEFAULT_MAX_FRAME
        # send-side flow control (RFC 9113 §5.2): the connection
        # window starts at 65535 and moves only via WINDOW_UPDATE on
        # stream 0; each stream starts at the peer's
        # SETTINGS_INITIAL_WINDOW_SIZE (changes retro-adjust the
        # active stream, §6.9.2)
        self.send_window = DEFAULT_WINDOW          # connection-level
        self.initial_stream_window = DEFAULT_WINDOW
        self.stream_send_window = DEFAULT_WINDOW   # active stream
        self.closed = False
        self._buf = b""
        self._pending: list = []  # frames read while awaiting window
        self._recv_debt = 0  # conn-window credit deferred to next use
        self._did_handshake = False

    # -- raw io --------------------------------------------------------

    def _drive(self, gen, deadline: float):
        """Sync driver for the sans-io generators: ("send", bytes)
        writes, ("recv",) reads — each op under the remaining-time
        budget. AsyncH2Connection drives the SAME generators with
        asyncio streams; the protocol logic exists once."""
        try:
            op = gen.send(None)
            while True:
                if time.monotonic() >= deadline:
                    raise TimeoutError("h2 i/o timed out")
                self.sock.settimeout(max(0.1, deadline - time.monotonic()))
                if op[0] == "send":
                    self.sock.sendall(op[1])
                    op = gen.send(None)
                else:
                    op = gen.send(self.sock.recv(65536))
        except StopIteration as s:
            return s.value

    def _steps_recv_frame(self):
        """Yields ("recv",) until one whole frame is buffered; b""
        from the driver means peer EOF."""
        while len(self._buf) < 9:
            data = yield ("recv",)
            if not data:
                raise H2Error("connection closed mid-frame")
            self._buf += data
        ln = struct.unpack(">I", b"\x00" + self._buf[:3])[0]
        ftype, flags = self._buf[3], self._buf[4]
        stream_id = struct.unpack(">I", self._buf[5:9])[0] & 0x7FFFFFFF
        while len(self._buf) < 9 + ln:
            data = yield ("recv",)
            if not data:
                raise H2Error("connection closed mid-frame")
            self._buf += data
        payload = self._buf[9:9 + ln]
        self._buf = self._buf[9 + ln:]
        return ftype, flags, stream_id, payload

    # -- session -------------------------------------------------------

    def _handshake_bytes(self) -> bytes:
        """Preface + SETTINGS (crawler.c:1152-1160); the server's
        SETTINGS is consumed lazily in the frame loop."""
        settings = struct.pack(
            ">HIHI",
            SETTINGS_MAX_CONCURRENT_STREAMS, 100,
            SETTINGS_ENABLE_PUSH, 0,
        )
        self._did_handshake = True
        return PREFACE + pack_frame(F_SETTINGS, 0, 0, settings)

    def _handle_control(self, ftype, flags, stream_id, payload) -> bytes:
        """Connection-level frame bookkeeping; returns the bytes to
        send in reply (SETTINGS/PING acks), if any."""
        if ftype == F_SETTINGS and not (flags & FLAG_ACK):
            for off in range(0, len(payload) - 5, 6):
                ident, value = struct.unpack(
                    ">HI", payload[off:off + 6]
                )
                if ident == SETTINGS_MAX_FRAME_SIZE:
                    self.peer_max_frame = value
                if ident == SETTINGS_INITIAL_WINDOW_SIZE:
                    # retro-adjust the active stream's window by the
                    # delta (RFC 9113 §6.9.2)
                    delta = value - self.initial_stream_window
                    self.initial_stream_window = value
                    self.stream_send_window += delta
            return pack_frame(F_SETTINGS, FLAG_ACK, 0)
        elif ftype == F_WINDOW_UPDATE and stream_id == 0:
            if len(payload) >= 4:
                inc = struct.unpack(">I", payload[:4])[0] & 0x7FFFFFFF
                self.send_window += inc
        elif ftype == F_PING and not (flags & FLAG_ACK):
            return pack_frame(F_PING, FLAG_ACK, 0, payload)
        elif ftype == F_GOAWAY:
            self.closed = True
            err = struct.unpack(">I", payload[4:8])[0] if len(payload) >= 8 else 0
            if err != 0:
                raise H2Error("GOAWAY error %d" % err)
        elif ftype == F_PUSH_PROMISE:
            # push is disabled in our SETTINGS; a server that pushes
            # anyway violates RFC 9113 §8.4
            raise H2Error("unexpected PUSH_PROMISE")
        return b""

    def _steps_wait_window(self, stream_id: int):
        """Until a WINDOW_UPDATE opens send capacity. Response/stray
        frames that arrive first queue for the response loop."""
        while (min(self.send_window, self.stream_send_window) <= 0):
            ftype, fflags, sid, payload = yield from self._steps_recv_frame()
            if ftype == F_WINDOW_UPDATE and sid == stream_id:
                if len(payload) >= 4:
                    inc = struct.unpack(">I", payload[:4])[0] & 0x7FFFFFFF
                    self.stream_send_window += inc
            elif sid == 0:
                out = self._handle_control(ftype, fflags, sid, payload)
                if out:
                    yield ("send", out)
            elif ftype == F_RST_STREAM and sid == stream_id:
                err = struct.unpack(">I", payload[:4])[0]
                raise H2Error("stream reset by server (error %d)" % err)
            else:
                self._pending.append((ftype, fflags, sid, payload))

    # -- request/response ----------------------------------------------

    def request(self, method: str, scheme: str, authority: str,
                path: str, headers: List[Tuple[str, str]],
                body: Optional[bytes], deadline: float) -> bytes:
        """Run one stream to completion; returns the response
        synthesized as HTTP/1.1-style raw bytes."""
        return self._drive(
            self._steps_request(method, scheme, authority, path,
                                headers, body),
            deadline,
        )

    def _steps_request(self, method: str, scheme: str, authority: str,
                       path: str, headers: List[Tuple[str, str]],
                       body: Optional[bytes]):
        if not self._did_handshake:
            yield ("send", self._handshake_bytes())
        if self._recv_debt:
            # pay back the connection window consumed by previous
            # responses' final DATA frames (see the END_STREAM branch)
            yield (
                "send",
                pack_frame(
                    F_WINDOW_UPDATE, 0, 0,
                    struct.pack(">I", self._recv_debt),
                ),
            )
            self._recv_debt = 0
        stream_id = self.next_stream
        self.next_stream += 2

        nva = [
            (b":method", method.encode("latin-1")),
            (b":scheme", scheme.encode("latin-1")),
            (b":authority", authority.encode("latin-1")),
            (b":path", path.encode("latin-1")),
        ] + [
            (n.lower().encode("latin-1"), v.encode("latin-1"))
            for n, v in headers
            # connection-specific headers are illegal in h2 (RFC 9113
            # §8.2.2); Host became :authority
            if n.lower() not in ("host", "connection", "keep-alive",
                                 "transfer-encoding", "upgrade")
        ]
        block = self.encoder.encode(nva)
        flags = FLAG_END_HEADERS | (0 if body else FLAG_END_STREAM)
        self.stream_send_window = self.initial_stream_window
        yield ("send", pack_frame(F_HEADERS, flags, stream_id, block))
        if body:
            # DATA respects BOTH send windows (RFC 9113 §5.2): when
            # exhausted, block on the peer's WINDOW_UPDATE (response
            # frames arriving meanwhile queue for the loop below)
            off = 0
            while off < len(body):
                avail = min(self.send_window, self.stream_send_window)
                if avail <= 0:
                    yield from self._steps_wait_window(stream_id)
                    continue
                n = min(avail, self.peer_max_frame, len(body) - off)
                chunk = body[off:off + n]
                off += n
                yield (
                    "send",
                    pack_frame(
                        F_DATA,
                        FLAG_END_STREAM if off == len(body) else 0,
                        stream_id, chunk,
                    ),
                )
                self.send_window -= n
                self.stream_send_window -= n

        status: Optional[int] = None
        resp_headers: List[Tuple[bytes, bytes]] = []
        body_parts: List[bytes] = []
        header_frag = b""
        in_headers = False
        trailer_pass = False
        # END_STREAM lives on the initiating HEADERS frame (RFC 9113
        # §6.2), so it must be remembered across CONTINUATIONs
        headers_end_stream = False
        while True:
            if self._pending:
                ftype, fflags, sid, payload = self._pending.pop(0)
            else:
                ftype, fflags, sid, payload = (
                    yield from self._steps_recv_frame()
                )
            if in_headers:
                if ftype != F_CONTINUATION or sid != stream_id:
                    raise H2Error("expected CONTINUATION")
                header_frag += payload
                if fflags & FLAG_END_HEADERS:
                    in_headers = False
                    decoded = self.decoder.decode(header_frag)
                    if not trailer_pass:
                        status, resp_headers = self._split_status(decoded)
                        if status is not None and 100 <= status < 200:
                            status = None
                            resp_headers = []
                    if headers_end_stream:
                        break
                continue
            if sid == 0:
                out = self._handle_control(ftype, fflags, sid, payload)
                if out:
                    yield ("send", out)
                continue
            if sid != stream_id:
                # stray frame for an old/pushed stream: reset it
                if ftype not in (F_PRIORITY, F_WINDOW_UPDATE, F_RST_STREAM):
                    yield (
                        "send",
                        pack_frame(
                            F_RST_STREAM, 0, sid,
                            struct.pack(">I", 0x5),  # STREAM_CLOSED
                        ),
                    )
                continue
            if ftype == F_HEADERS:
                frag = payload
                if fflags & FLAG_PADDED:
                    pad = frag[0]
                    frag = frag[1:len(frag) - pad]
                if fflags & FLAG_PRIORITY:
                    frag = frag[5:]
                if fflags & FLAG_END_HEADERS:
                    decoded = self.decoder.decode(frag)
                    if status is None:
                        status, resp_headers = self._split_status(decoded)
                        # 1xx interim responses precede the real one
                        if status is not None and 100 <= status < 200:
                            status = None
                            resp_headers = []
                    else:
                        trailer_pass = True  # trailers: decoded, dropped
                    if fflags & FLAG_END_STREAM:
                        break
                else:
                    header_frag = frag
                    in_headers = True
                    trailer_pass = status is not None
                    headers_end_stream = bool(fflags & FLAG_END_STREAM)
            elif ftype == F_DATA:
                frag = payload
                if fflags & FLAG_PADDED:
                    pad = frag[0]
                    frag = frag[1:len(frag) - pad]
                body_parts.append(frag)
                if fflags & FLAG_END_STREAM:
                    # do NOT replenish now: the stream is closed (a
                    # stream WINDOW_UPDATE would be meaningless) and a
                    # peer that closes right after its final frame
                    # would turn our write into a reset; the
                    # connection-level credit is deferred to the next
                    # request on this session (_recv_debt)
                    self._recv_debt += len(payload)
                    break
                if len(payload):
                    # replenish both flow-control windows (RFC 9113
                    # §5.2.2); the reference delegates this to nghttp2
                    inc = struct.pack(">I", len(payload))
                    yield (
                        "send",
                        pack_frame(F_WINDOW_UPDATE, 0, 0, inc)
                        + pack_frame(F_WINDOW_UPDATE, 0, stream_id, inc),
                    )
            elif ftype == F_RST_STREAM:
                err = struct.unpack(">I", payload[:4])[0]
                raise H2Error("stream reset by server (error %d)" % err)
            elif ftype == F_WINDOW_UPDATE:
                if len(payload) >= 4:
                    inc = struct.unpack(">I", payload[:4])[0] & 0x7FFFFFFF
                    self.stream_send_window += inc
            # PRIORITY on our stream: ignored

        if status is None:
            raise H2Error("stream ended without response headers")
        head = b"HTTP/1.1 %d\r\n" % status
        for n, v in resp_headers:
            head += n + b": " + v + b"\r\n"
        return head + b"\r\n" + b"".join(body_parts)

    @staticmethod
    def _split_status(decoded):
        status = None
        headers = []
        for n, v in decoded:
            if n == b":status":
                status = int(v or b"0")
            elif n.startswith(b":"):
                continue
            else:
                headers.append((n, v))
        return status, headers

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass
        self.closed = True


class AsyncH2Connection(H2Connection):
    """The same sans-io protocol core driven by asyncio streams — the
    nonblocking-socket path the fetch-stage multiplexer uses, so one
    event-loop thread carries every h2 session in a partition (the
    reference's one-thread/many-sockets shape, crawler.c:1809-1860)."""

    def __init__(self, reader, writer):
        super().__init__(sock=None)
        self.reader = reader
        self.writer = writer

    async def request_async(self, method: str, scheme: str,
                            authority: str, path: str,
                            headers: List[Tuple[str, str]],
                            body: Optional[bytes],
                            deadline: float) -> bytes:
        import asyncio

        gen = self._steps_request(method, scheme, authority, path,
                                  headers, body)
        try:
            op = gen.send(None)
            while True:
                if time.monotonic() >= deadline:
                    raise TimeoutError("h2 i/o timed out")
                budget = max(0.1, deadline - time.monotonic())
                if op[0] == "send":
                    self.writer.write(op[1])
                    await asyncio.wait_for(self.writer.drain(), budget)
                    op = gen.send(None)
                else:
                    data = await asyncio.wait_for(
                        self.reader.read(65536), budget
                    )
                    op = gen.send(data)
        except StopIteration as s:
            return s.value

    def close(self) -> None:
        try:
            self.writer.close()
        except Exception:
            pass
        self.closed = True
