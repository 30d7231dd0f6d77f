"""Per-IP politeness slots — the reference's 64-entry hash table over
the 16-byte IP (src/time.c:43-96), including its collision semantics:
two different IPs hashing to the same slot SHARE the politeness
channel and delay each other. Round 1 deliberately replaced this with
per-host buckets (1:1 on the fixture web); `CrawlSettings.
politeness_by_ip` restores the reference behavior for shared-IP
hosting.

The hash is the reference's exactly (time.c:70-79): over the four
little-endian u32 words of the key,
    hash = 13*rotl16(k) ^ 113*((k >> 20) | (k << 10)) ^ hash
seeded with word 0 (so word 0 contributes twice), all mod 2^32; the
slot is hash % 64. tests/test_ipslot.py verifies this differentially
against an oracle binary compiled from the reference's own time.c.

IPv4 addresses occupy the FIRST 4 bytes of the 16-byte key, rest
zero — the reference memcpy's h_length==4 bytes into a zeroed
16-byte field (crawler.c:460, 547)."""

from __future__ import annotations

import hashlib
import socket
import struct

HASH_SIZE = 64  # time.c:43
_M32 = 0xFFFFFFFF


def time_slot(key16: bytes) -> int:
    """get_time_slot (time.c:83-86) on a 16-byte key."""
    if len(key16) != 16:
        raise ValueError("key must be 16 bytes")
    words = struct.unpack("<4I", key16)  # *(int*)key: little-endian
    h = words[0]
    for k in words:
        rot16 = ((k >> 16) | (k << 16)) & _M32
        mix = ((k >> 20) | (k << 10)) & _M32
        h = ((13 * rot16) & _M32) ^ ((113 * mix) & _M32) ^ h
    return h % HASH_SIZE


def ip16(ip_str: str) -> bytes:
    """Pack a textual IP the way the reference stores it: IPv4 in the
    first 4 bytes of a zeroed 16-byte field, IPv6 as its 16 bytes."""
    try:
        return socket.inet_aton(ip_str) + b"\x00" * 12
    except OSError:
        return socket.inet_pton(socket.AF_INET6, ip_str)


def fixture_ip(hostname: str) -> str:
    """Deterministic pseudo-IPv4 for the fixture web (no DNS): the
    first 4 bytes of md5('ip:'+hostname), first octet forced to 10 so
    the address is stable, private, and never 0."""
    d = hashlib.md5(b"ip:" + hostname.encode("utf-8", "ignore")).digest()
    return "10.%d.%d.%d" % (d[0], d[1], d[2])


def resolve_slot(hostname: str, real_dns: bool) -> int:
    """hostname -> politeness slot. Real mode shares the fetcher's
    cached resolution (httpfetch.resolved_ip) so the slot keys on the
    SAME first-choice IP the connector dials — one getaddrinfo per
    host per TTL, never a second independent lookup that round-robin
    DNS could send elsewhere. Fixture mode (and an unresolvable host,
    whose fetch will fail with its own error anyway) derives the
    deterministic pseudo-IP for a stable slot."""
    if real_dns:
        from ..sources.httpfetch import resolved_ip

        chosen = resolved_ip(hostname) or fixture_ip(hostname)
    else:
        chosen = fixture_ip(hostname)
    return time_slot(ip16(chosen))
