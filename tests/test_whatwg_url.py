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


def test_canonicalize_full_batch_matches_state_machine():
    """The vectorized fast + medium paths must agree row-for-row with
    the per-row WHATWG state machine (canonicalize_full) on corpus
    inputs, the bench frontier mix, and adversarial shapes."""
    import math

    from minicrawler_spark.functions.urlnorm import (
        canonicalize_full,
        canonicalize_full_batch,
    )

    cases = []
    for c in CASES:
        cases.append((c["input"], c.get("base")))
    for k in range(4000):
        h, v = k % 97, k % 8
        if v < 5:
            cases.append((f"http://host{h}.example.com/page/{k%50}?q={v}", None))
        elif v == 5:
            cases.append((f"HTTP://HOST{h}.Example.COM:80/page/{k%50}", None))
        elif v == 6:
            cases.append((f"http://host{h}.example.com/a/../page/{k%50}", None))
        else:
            cases.append((f"http://host{h}.example.com/p%61ge/{k%50}#frag", None))
    cases += [(u, None) for u in [
        "http://a.com", "HTTPS://A.com:443/y", "HTTP://a.com:080/x",
        "HTTP://a.com:65536/x", "http://a.com:65535/x", "hTtP://a.com#f",
        "http://user:pw@A.com/x", "http://a.com/p%2e/x", "http://a.com/x%",
        "http://" + "a" * 64 + ".com/x", "http://a.com/" + "p" * 9000,
        "http://café.com/x", "  http://a.com/x ", "ht\ttp://a.com/x",
        "http://a.com/x#f\nrag", "", None, "ftp://a.com/x", "x" * 9000,
    ]]
    cases += [(r, "http://base.test/dir/file?q0")
              for r in ["page/2", "../x", "/abs", "//other.com/p", "?q=2"]]

    out = canonicalize_full_batch(
        [c[0] for c in cases], [c[1] for c in cases]
    )
    for i, (u, b) in enumerate(cases):
        exp = canonicalize_full(u, b)
        got = tuple(
            None if (x is None or (isinstance(x, float) and math.isnan(x)))
            else x
            for x in out.iloc[i]
        )
        assert got == exp, f"{u!r} (base={b!r}): {got} != {exp}"


def test_dot_segment_before_query_collapses():
    """Regression: '/a/..?q=1' must collapse the dot segment even
    though it is terminated by '?' not '/' (found by differential
    fuzz against the compiled reference parser)."""
    from minicrawler_spark.functions.urlnorm import (
        canonicalize,
        canonicalize_full_batch,
    )

    cases = {
        "http://a.com/b/..?q=1": "http://a.com/?q=1",
        "http://a.com/b/.?q=1": "http://a.com/b/?q=1",
        "https://a.com/x/y/..": "https://a.com/x/",
        "HTTP://A.com/b/..?q#f": "http://a.com/?q",
        "http://a.com/b..?q=1": "http://a.com/b..?q=1",   # not a dot seg
        "http://a.com/..b?q=1": "http://a.com/..b?q=1",   # not a dot seg
    }
    out = canonicalize_full_batch(list(cases))
    for i, (u, exp) in enumerate(cases.items()):
        assert canonicalize(u)[0] == exp, u
        assert out.iloc[i]["href"] == exp, u


def test_apostrophe_query_encodes_consistently():
    """Regression (round-2 advice): WHATWG percent-encodes ' to %27 in
    special-scheme QUERIES but not in paths. The fast/medium batch paths
    must agree with the state machine or one URL gets two canonical
    hrefs, splitting the URL-seen set."""
    from minicrawler_spark.functions.urlnorm import (
        canonicalize,
        canonicalize_full,
        canonicalize_full_batch,
    )

    cases = {
        "http://h.example.com/p?a='1'": "http://h.example.com/p?a=%271%27",
        # apostrophe in PATH is left verbatim (not in the path encode set)
        "http://h.example.com/p'x/q": "http://h.example.com/p'x/q",
        "https://h.example.com/p'?b='": "https://h.example.com/p'?b=%27",
    }
    out = canonicalize_full_batch(list(cases))
    for i, (u, exp) in enumerate(cases.items()):
        assert canonicalize(u)[0] == exp, u
        assert canonicalize_full(u)[0] == exp, u
        assert out.iloc[i]["href"] == exp, u
    # relative-resolution (slow path) agrees with the absolute form
    assert (
        canonicalize("/p?a='1'", "http://h.example.com/")[0]
        == "http://h.example.com/p?a=%271%27"
    )
