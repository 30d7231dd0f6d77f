"""Cookie engine — semantics locked against cookies.c (date grammar
oracle-differential-fuzzed: 8000 dates, 0 diffs)."""

from minicrawler_spark.functions.cookies import (
    LONG_MAX,
    cookie_header,
    cookie_upsert,
    netscape_line,
    parse_cookie_date,
    parse_netscape,
    parse_set_cookie,
    remove_expired,
)

NOW = 1_700_000_000


def sc(header, host="example.com", path="/a/b?q", now=NOW):
    return parse_set_cookie(header, host, path, now)


def test_date_grammar():
    assert parse_cookie_date("Wed, 09 Jun 2021 10:18:14 GMT") == 1623233894
    assert parse_cookie_date("09 Jun 2021 10:18:14") == 1623233894
    # any order
    assert parse_cookie_date("2021 Jun 09 10:18:14") == 1623233894
    # 2-digit year windowing
    assert parse_cookie_date("31 Dec 99 23:59:59") == 946684799
    assert parse_cookie_date("01 Jan 69 00:00:00") == 3124224000
    # pre-1970 clamp to epoch
    assert parse_cookie_date("01 Jan 1950 00:00:00") == 0
    assert parse_cookie_date("garbage") is None
    # partial time match turns "12:34" into a YEAR (p-reuse quirk)
    assert parse_cookie_date("12:34 January 0 23:59:59") == 1325375999
    # out-of-range fields normalize arithmetically (timegm)
    # day=99, year=99 -> 1999; timegm normalizes mday/h/m/s overflow
    assert parse_cookie_date("99 99 Jan 99:99:99 99") == 923978439


def test_set_cookie_basic():
    c = sc("sid=abc123; Path=/; Secure")
    assert c == {
        "name": "sid", "value": "abc123", "domain": "example.com",
        "path": "/", "secure": True, "host_only": True, "expires": LONG_MAX,
    }
    assert sc("noequals") is None
    assert sc("=val") is None  # empty name
    assert sc(" sp aced = v ;")["name"] == "sp aced"


def test_domain_rules():
    # leading dot stripped, host_only cleared
    c = sc("a=1; Domain=.example.com")
    assert c["domain"] == "example.com" and not c["host_only"]
    # substring-suffix match (NOT dot-boundary): quirk reproduced
    assert sc("a=1; Domain=le.com")["domain"] == "le.com"
    # mismatch -> rejected
    assert sc("a=1; Domain=other.com") is None
    # first-occurrence rule: "com" in "com.com" found at 0, not at end
    assert parse_set_cookie("a=1; Domain=com", "com.com", "/", NOW) is None
    # empty Domain attr ignored -> host_only default
    assert sc("a=1; Domain=")["host_only"] is True


def test_expiry_rules():
    assert sc("a=1; Max-Age=100")["expires"] == NOW + 100
    assert sc("a=1; Max-Age=0")["expires"] == 0
    assert sc("a=1; Max-Age=-5")["expires"] == 0
    assert sc("a=1; Max-Age=")["expires"] == 0  # strtol("") == 0 quirk
    assert sc("a=1; Max-Age=5x")["expires"] == LONG_MAX  # junk -> skipped
    # attributes processed in order: later one wins
    assert sc("a=1; Max-Age=100; Expires=Wed, 09 Jun 2021 10:18:14 GMT")[
        "expires"] == 1623233894
    assert sc("a=1; Expires=Wed, 09 Jun 2021 10:18:14 GMT; Max-Age=100")[
        "expires"] == NOW + 100
    # invalid Expires does not reset
    assert sc("a=1; Expires=junk")["expires"] == LONG_MAX


def test_default_path():
    assert sc("a=1", path="/a/b/c?x=1")["path"] == "/a/b"
    assert sc("a=1", path="/top?x")["path"] == "/"
    assert sc("a=1", path="/")["path"] == "/"
    # explicit path must start with /
    assert sc("a=1; Path=relative", path="/a/b")["path"] == "/a"
    assert sc("a=1; Path=/x/y")["path"] == "/x/y"


def test_upsert_and_cap():
    jar = []
    jar = cookie_upsert(jar, sc("a=1"))
    jar = cookie_upsert(jar, sc("b=2"))
    jar = cookie_upsert(jar, sc("A=3"))  # name ci -> replaces slot 0
    assert [c["value"] for c in jar] == ["3", "2"]
    assert jar[0]["name"] == "A"
    for i in range(30):
        jar = cookie_upsert(jar, sc(f"extra{i}=v"))
    assert len(jar) == 25


def test_expiry_eviction():
    jar = [sc("a=1; Max-Age=10"), sc("b=2; Max-Age=100")]
    assert [c["name"] for c in remove_expired(jar, NOW + 50)] == ["b"]
    # boundary: now == expires stays (strictly greater evicts)
    assert len(remove_expired(jar, NOW + 10)) == 2


def test_send_match():
    jar = [
        sc("a=1; Path=/a"),
        sc("b=2; Path=/a/"),
        sc("c=3; Path=/ab"),
        sc("s=4; Secure"),
        sc("d=5; Domain=example.com"),
    ]
    hdr = cookie_header(jar, "example.com", "/a/b?q", "http")
    assert hdr == "a=1; b=2; d=5"
    # path boundary: /ab does not match /a/b; but /a matches /a?q and /a
    assert cookie_header(jar, "example.com", "/ab", "http") == "c=3"
    assert cookie_header(jar, "example.com", "/a?z", "http") == "a=1; d=5"
    # secure cookie only on https
    assert "s=4" in cookie_header(jar, "example.com", "/a", "https")
    # host_only: exact match only; domain cookie: substring-suffix
    assert cookie_header(jar, "www.example.com", "/a", "http") == "d=5"
    # case-insensitive host compare
    assert "a=1" in cookie_header(jar, "EXAMPLE.com", "/a", "http")


def test_netscape_roundtrip():
    c = sc("sid=xyz; Domain=.example.com; Path=/p; Secure; Max-Age=50")
    line = netscape_line(c)
    assert line == "example.com\t0\t/p\t1\t%d\tsid\txyz" % (NOW + 50)
    assert parse_netscape(line) == c
