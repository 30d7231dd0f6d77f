"""Cookie-jar semantics — RFC 6265 as the reference implements it.

Pure functions (no wall-clock reads: `now` is always a parameter so
crawl rounds are deterministic and Spark-vectorizable) mirroring
/root/reference/src/cookies.c, quirks included:

- tolerant cookie-date grammar (cookies.c:39-120): strtok over the
  RFC 6265 delimiter set; time/day/month/year found in any order;
  2-digit year windowing 70-99 -> 19xx, 0-69 -> 20xx; pre-1970 clamp
  to epoch; out-of-range fields normalize arithmetically (timegm),
- Max-Age: full-string strtol with C int truncation; <=0 -> epoch;
  empty string parses as 0 (strtol quirk) (cookies.c:258-272),
- attribute list capped at 10, attributes processed in order (a later
  Expires overwrites an earlier Max-Age and vice versa),
- Domain: strip ONE leading dot; host match is strcasestr FIRST
  occurrence + end anchor — substring-suffix, NOT dot-boundary
  (cookies.c:136-137, 308-313; e.g. domain "le.com" matches host
  "example.com", but domain "com" does NOT match "com.com" because
  the first occurrence is not at the end). Reproduced verbatim,
- default path = directory of request path-and-query cut at '?'
  (cookies.c:319-331),
- session cookie (no expiry) -> LONG_MAX (cookies.c:315-317),
- upsert key (name ci, domain ci, path case-sensitive), replacement
  keeps the slot position, store capped at 25 (cookies.c:334-355),
- eviction: strictly now > expires (cookies.c:154-168),
- send match (cookies.c:128-150): host-only exact-ci, else the
  substring-suffix rule; path prefix with '/'-or-'?'-or-end boundary
  against path+query; secure requires https,
- netscape jar line: domain\\thost_only\\tpath\\tsecure\\texpires\\t
  name\\tvalue (cli.c:82-96, 280).
"""

from __future__ import annotations

import calendar
import re
from typing import Optional

__all__ = [
    "parse_cookie_date",
    "parse_set_cookie",
    "cookie_upsert",
    "remove_expired",
    "cookie_header",
    "netscape_line",
    "parse_netscape",
    "LONG_MAX",
]

LONG_MAX = (1 << 63) - 1

_DELIMS = "\x09\x20\x21\x22\x23\x24\x25\x26\x27\x28\x29\x2A\x2B\x2C\x2D\x2E\x2F\x3B\x3C\x3D\x3E\x3F\x40\x5B\x5C\x5D\x5E\x5F\x60\x7B\x7C\x7D\x7E"
_SPLIT_RE = re.compile("[" + re.escape(_DELIMS) + "]+")
_MONTHS = {
    "jan": 0, "feb": 1, "mar": 2, "apr": 3, "may": 4, "jun": 5,
    "jul": 6, "aug": 7, "sep": 8, "oct": 9, "nov": 10, "dec": 11,
}
_DIGITS = re.compile(r"[0-9]*")


def _leading_digits(s: str):
    m = _DIGITS.match(s)
    return (int(m.group()) if m.group() else 0), m.end()


def parse_cookie_date(date: str) -> Optional[int]:
    """cookies.c:39-120. Returns epoch seconds or None on failure.

    The reference reuses the strtol end-pointer `p` across the
    time/day/year checks, so a PARTIAL time match (e.g. "12:34")
    leaves p past the colon and the token then classifies as a YEAR
    (p-start==3 in [2,4]) instead of a day — oracle-verified and
    reproduced exactly."""
    found_time = found_day = found_month = found_year = False
    hour = minute = sec = mday = mon = year = 0
    for token in _SPLIT_RE.split(date):
        if not token:
            continue
        n, p = _leading_digits(token)
        if not found_time:
            if p <= 2 and p < len(token) and token[p] == ":":
                p += 1  # past the colon (C: p++)
                mn, qlen = _leading_digits(token[p:])
                q = p + qlen
                if q < len(token) and token[q] == ":" and 1 <= qlen <= 2:
                    q += 1  # past the second colon
                    sc, rlen = _leading_digits(token[q:])
                    p = q + rlen  # C: strtol(q, &p, 10)
                    if 1 <= rlen <= 2:  # trailing junk allowed
                        hour, minute, sec = n, mn, sc
                        found_time = True
                        continue
        if not found_day:
            if 1 <= p <= 2:  # p possibly mutated by the time attempt
                mday = n
                found_day = True
                continue
        if not found_month:
            m = _MONTHS.get(token[:3].lower())
            if m is not None and len(token) >= 3:
                mon = m
                found_month = True
                continue
        if not found_year:
            if 2 <= p <= 4:
                year = n
                found_year = True
                continue
    if not (found_time and found_day and found_month and found_year):
        return None
    if 70 <= year <= 99:
        year += 1900
    elif 0 <= year <= 69:
        year += 2000
    if year < 1970:
        return 0
    # timegm normalizes out-of-range mday/hour/min/sec arithmetically,
    # as does calendar.timegm
    return calendar.timegm((year, mon + 1, mday, hour, minute, sec, 0, 0, 0))


def _trim(s: str) -> str:
    return s.strip(" \t")


_INT_MASK = (1 << 32) - 1


def _strtol_int(s: str) -> Optional[int]:
    """strtol + C int truncation; None when trailing junk remains.
    Empty string parses as 0 (strtol leaves endptr at the NUL)."""
    m = re.match(r"[ \t\n\v\f\r]*([+-]?[0-9]+)$", s)
    if m is None:
        # no conversion: endptr at start; valid only for empty input
        return 0 if s == "" else None
    raw = int(m.group(1))
    # strtol clamps to LONG_MAX/LONG_MIN before the int truncation
    raw = max(min(raw, LONG_MAX), -(1 << 63))
    val = raw & _INT_MASK
    if val >= 1 << 31:
        val -= 1 << 32
    return val


def parse_set_cookie(
    header: str, request_host: str, request_path_query: str, now: int
) -> Optional[dict]:
    """setcookie (cookies.c:174-359) minus the store step. Returns the
    cookie record or None when rejected."""
    nv, _, attributestr = header.partition(";")
    name, eq, value = nv.partition("=")
    if not eq:
        return None
    name = _trim(name)
    value = _trim(value)
    if not name:
        return None

    expires = -1
    domain: Optional[str] = None
    path: Optional[str] = None
    secure = False
    host_only = False

    attrs = []
    rest = attributestr
    while rest:
        if len(attrs) > 9:
            break
        a, sep, rest = rest.partition(";")
        an, aeq, av = a.partition("=")
        attrs.append((_trim(an), _trim(av)))
        if not sep:
            break

    for an, av in attrs:
        anl = an.lower()
        if anl == "expires":
            e = parse_cookie_date(av)
            if e is not None:
                expires = e
        elif anl == "max-age":
            max_age = _strtol_int(av)
            if max_age is None:
                continue
            expires = 0 if max_age <= 0 else now + max_age
        elif anl == "domain":
            if av:
                v = av[1:] if av.startswith(".") else av
                domain = v
                host_only = False
        elif anl == "path":
            path = av if av.startswith("/") else None
        elif anl == "secure":
            secure = True

    if domain is None:
        domain = request_host
        host_only = True
    else:
        if not _suffix_match(request_host, domain):
            return None

    if expires < 0:
        expires = LONG_MAX

    if path is None:
        p = request_path_query.split("?", 1)[0]
        slash = p.rfind("/")
        path = p[:slash] if slash > 0 else "/"

    return {
        "name": name,
        "value": value,
        "domain": domain,
        "path": path,
        "secure": secure,
        "host_only": host_only,
        "expires": expires,
    }


def _suffix_match(hostname: str, domain: str) -> bool:
    """The reference's strcasestr + end-anchor check: FIRST
    case-insensitive occurrence must sit at the end of hostname."""
    pos = hostname.lower().find(domain.lower())
    if pos == -1:
        return False
    return pos + len(domain) == len(hostname)


def cookie_upsert(jar: list, cookie: dict, cap: int = 25) -> list:
    """Replace-in-slot by (name ci, domain ci, path cs), else append;
    drop when the store is full (cookies.c:334-355)."""
    key = (cookie["name"].lower(), cookie["domain"].lower(), cookie["path"])
    out = list(jar)
    for t, c in enumerate(out):
        if (c["name"].lower(), c["domain"].lower(), c["path"]) == key:
            out[t] = cookie
            return out
    if len(out) < cap:
        out.append(cookie)
    return out


def remove_expired(jar: list, now: int) -> list:
    return [c for c in jar if now <= c["expires"]]


def cookie_header(
    jar: list, hostname: str, path_query: str, scheme: str
) -> str:
    """RFC 6265 §5.4 as set_cookies_header (cookies.c:128-150)."""
    parts = []
    for c in jar:
        if c["host_only"]:
            if hostname.lower() != c["domain"].lower():
                continue
        elif not _suffix_match(hostname, c["domain"]):
            continue
        cp = c["path"]
        if not path_query.startswith(cp):
            continue
        if not (
            cp.endswith("/")
            or len(path_query) == len(cp)
            or path_query[len(cp)] in ("/", "?")
        ):
            continue
        if c["secure"] and scheme != "https":
            continue
        parts.append("%s=%s" % (c["name"], c["value"]))
    return "; ".join(parts)


def netscape_line(c: dict) -> str:
    return "%s\t%d\t%s\t%d\t%d\t%s\t%s" % (
        c["domain"],
        1 if c["host_only"] else 0,
        c["path"],
        1 if c["secure"] else 0,
        c["expires"],
        c["name"],
        c["value"],
    )


def parse_netscape(line: str) -> Optional[dict]:
    parts = re.split(r"\s+", line.strip())
    if len(parts) < 7:
        return None
    domain, host_only, path, secure, expires, name, value = parts[:7]
    try:
        return {
            "name": name,
            "value": value,
            "domain": domain,
            "path": path,
            "secure": bool(int(secure)),
            "host_only": bool(int(host_only)),
            "expires": int(expires),
        }
    except ValueError:
        return None
