"""WHATWG URL conformance — the reference's own 311-case corpus.

Mirrors /root/reference/test/run + test/url.c:15-81: each case's input
(+ optional base) goes through the parser; expected component getters
(href/protocol/username/password/host/hostname/port/pathname/search/
hash) or failure=true must match exactly.
"""

import json
import os

import pytest

from minicrawler_spark.functions.urlnorm import (
    canonicalize,
    getters,
    parse_url,
    serialize_url,
)

CORPUS = "/root/reference/test/urltestdata.json"


def _load_cases():
    if not os.path.exists(CORPUS):
        return []
    return [c for c in json.load(open(CORPUS)) if isinstance(c, dict)]


CASES = _load_cases()


@pytest.mark.skipif(not CASES, reason="reference corpus not available")
@pytest.mark.parametrize("case", CASES, ids=lambda c: c["input"][:48])
def test_whatwg_corpus(case):
    base = None
    if case.get("base"):
        base = parse_url(case["base"])
        if base is None:
            assert case.get("failure") is True
            return
    url = parse_url(case["input"], base)
    if case.get("failure"):
        assert url is None, f"expected failure, got {getters(url)}"
        return
    assert url is not None, "expected success, got failure"
    got = getters(url)
    for key in (
        "href",
        "protocol",
        "username",
        "password",
        "host",
        "hostname",
        "port",
        "pathname",
        "search",
        "hash",
    ):
        if key in case:
            assert got[key] == case[key], f"{key}: {got[key]!r} != {case[key]!r}"


def test_reference_quirks():
    # embedded IPv4-in-IPv6 always fails (parse.cc:283-345 quirk)
    assert parse_url("http://[::127.0.0.1]/") is None
    # IPv4 radix forms
    u = parse_url("http://0x7f.1/")
    assert u.host.domain == "127.0.0.1"
    u = parse_url("http://0300.0250.0.01/")
    assert u.host.domain == "192.168.0.1"
    # part overflow -> hard failure
    assert parse_url("http://1.2.3.256/") is None
    # too many parts -> domain (then hyphenless etc ok)
    assert parse_url("http://1.2.3.4.5/").host.domain == "1.2.3.4.5"
    # ICU CheckHyphens (verified vs reference binary)
    assert parse_url("http://-a.com/") is None
    assert parse_url("http://a-.com/") is None
    assert parse_url("http://ab--cd.com/") is None
    assert parse_url("http://a--b.com/") is not None
    # empty labels fail except single trailing root dot
    assert parse_url("http://a..b/") is None
    assert parse_url("http://.a/") is None
    assert parse_url("http://a.b./").host.domain == "a.b."
    # DNS length limits
    assert parse_url("http://" + "a" * 63 + "/") is not None
    assert parse_url("http://" + "a" * 64 + "/") is None
    # IDNA
    assert parse_url("http://你好.cn/").host.domain == "xn--6qq79v.cn"
    assert parse_url("http://xn--6qq79v.cn/").host.domain == "xn--6qq79v.cn"
    assert parse_url("http://xn--a.com/") is None  # decodes to C1 control
    # default-port drop + scheme lowercase + dot segments
    assert (
        serialize_url(parse_url("HTTP://ExAmple.COM:80/a/b/../c/./d"))
        == "http://example.com/a/c/d"
    )


def test_canonicalize_fast_path_agrees_with_parser():
    urls = [
        "http://example.com/a/b?q=1",
        "https://a.b.co:8443/x",
        "http://ex.com",
        "https://ex.com?q",
        "http://sub.domain.example.org/path/to/page",
        "http://ex.com:80/x",       # default port -> slow path
        "http://ab--cd.com/x",      # hyphen34 -> must fail both ways
        "http://EX.com/A",          # uppercase -> slow path
        "http://ex.com/a/../b",     # dot segments -> slow path
    ]
    for s in urls:
        href, host, scheme, fail = canonicalize(s)
        u = parse_url(s)
        if u is None:
            assert fail
        else:
            assert not fail
            g = getters(u)
            assert href == serialize_url(u, exclude_fragment=True)
            assert host == g["host"]
            assert scheme == u.scheme
