"""The result sink's text rendering — minicrawler's stdout record
format (output(), src/cli.c:200-319; format_timing, cli.c:158-198).

One record per job:

    URL: <rawurl>
    [Redirected-To: <final href incl. fragment>]
    [Redirect-info: <raw Location> <status>; <timing>]   (newest first)
    Status: <status>
    Content-length: <len(body)>
    [Timeout: <state> (MCURL_S_x); <reason>]             (state <= RECVREPLY)
    [Error-msg: <msg>]
    [Content-type: <ct>[; charset=<cs>]]
    [WWW-Authenticate: <challenge>]
    [Cookies: <n> + netscape lines]
    Downtime: <downtime>ms; <downstart>ms
    Timing: <timing line>
    Index: <index>
    <blank line>
    <body bytes><newline>

This is a DRIVER-SIDE, collect()-based debug/diff surface (the typed
result DataFrame is the real sink, SURVEY §2.1); never use it in a
hot path. Timing values come from the engine's virtual clock —
deterministic stand-ins with the reference's field semantics.
"""

from __future__ import annotations

from typing import Optional

from .cookies import netscape_line

S_NAMES = [
    "MCURL_S_JUSTBORN", "MCURL_S_PARSEDURL", "MCURL_S_INDNS",
    "MCURL_S_GOTIP", "MCURL_S_CONNECT", "MCURL_S_HANDSHAKE",
    "MCURL_S_GENREQUEST", "MCURL_S_SENDREQUEST", "MCURL_S_RECVREPLY",
    "MCURL_S_DOWNLOADED", "MCURL_S_ERROR", "MCURL_S_DONE",
]

# cli.c:226-251 timeout reason table (subset reachable on the virtual
# clock; connectionstart is always set once a job starts)
TIMEOUT_ERRS = {
    0: "Process has not started yet",
    1: "Timeout while contacting DNS servers",
    2: "Timeout while resolving host",
    3: "Waiting for download slot",
    4: "Connection timed out",
    5: "Timeout during SSL handshake",
    6: "Timeout while generating HTTP request",
    7: "Timeout while sending HTTP request",
    8: "HTTP server timed out",
}

S_RECVREPLY, S_DOWNLOADED = 8, 9


def format_timing(t: Optional[dict], state: int, start: int) -> str:
    """Port of format_timing (cli.c:158-198); `t` is the timing struct
    as a dict (zeros = state never reached), `start` = downstart."""
    if not t:
        return ""
    out = []
    now = t.get("done") or 0

    def g(k):
        return t.get(k) or 0

    if start:
        first = g("dnsstart") or g("connectionstart") or g("requeststart")
        out.append("Redirect=%d ms; " % (first - start))
    if g("dnsstart"):
        out.append(
            "DNS Lookup=%d ms; " % ((g("dnsend") or now) - g("dnsstart"))
        )
    if g("connectionstart"):
        nxt = g("sslstart") or g("requeststart") or now
        out.append("Initial connection=%d ms; " % (nxt - g("connectionstart")))
    if g("sslstart"):
        out.append("SSL=%d ms; " % ((g("sslend") or now) - g("sslstart")))
    if g("requeststart"):
        out.append(
            "Request=%d ms; " % ((g("requestend") or now) - g("requeststart"))
        )
    if g("requestend"):
        out.append(
            "Waiting=%d ms; " % ((g("firstbyte") or now) - g("requestend"))
        )
    if g("firstbyte"):
        last = g("lastread") if (g("lastread") and state > S_RECVREPLY) else now
        out.append("Content download=%d ms; " % (last - g("firstbyte")))
    if start or g("connectionstart") or g("requeststart"):
        s = start or g("connectionstart") or g("requeststart")
        last = g("lastread") if (g("lastread") and state > S_RECVREPLY) else now
        out.append("Total=%d ms; " % (last - s))
    return "".join(out)


def render_output(row: dict, writebody: bool = True,
                  writehead: bool = False) -> bytes:
    """One result row (a finalize_results record as a dict) -> the
    reference's stdout record."""
    outcome = row.get("outcome") or "done"
    if outcome == "timeout":
        state = row.get("timeout_state")
        state = S_RECVREPLY if state is None else int(state)
    elif outcome == "error":
        state = 10  # MCURL_S_ERROR
    else:
        state = 11  # MCURL_S_DONE (output runs post-finish)

    t = row.get("timing")
    if t is not None and not isinstance(t, dict):
        t = t.asDict()  # Row -> dict
    downstart = int(row.get("downstart") or 0)
    body = row.get("body")
    body = bytes(body) if body is not None else b""

    h = ["URL: %s" % (row.get("rawurl") or "")]
    if row.get("redirectedto"):
        h.append("\nRedirected-To: %s" % row["redirectedto"])
    for hop in row.get("redirect_info") or []:
        hop = hop if isinstance(hop, dict) else hop.asDict()
        # per-hop timing is not retained on the virtual clock -> the
        # timing tail is empty, exactly like a hop with a zero struct
        h.append("\nRedirect-info: %s %d; " % (hop["url"], hop["status"]))
    h.append("\nStatus: %d\nContent-length: %d\n" % (
        int(row.get("status") or 0), len(body)))
    if state <= S_RECVREPLY:
        reason = row.get("timeout_reason") or TIMEOUT_ERRS.get(state, "")
        h.append("Timeout: %d (%s); %s\n" % (state, S_NAMES[state], reason))
    if row.get("error_msg"):
        h.append("Error-msg: %s\n" % row["error_msg"])
    if row.get("content_type"):
        h.append("Content-type: %s" % row["content_type"])
        if row.get("charset"):
            h.append("; charset=%s\n" % row["charset"])
        else:
            h.append("\n")
    if row.get("wwwauthenticate"):
        h.append("WWW-Authenticate: %s\n" % row["wwwauthenticate"])
    cookies = row.get("cookies") or []
    if cookies:
        h.append("Cookies: %d\n" % len(cookies))
        for c in cookies:
            c = c if isinstance(c, dict) else c.asDict()
            h.append(netscape_line(c) + "\n")

    done_ms = (t or {}).get("done") or 0
    lastread = (t or {}).get("lastread") or 0
    if state == S_DOWNLOADED:
        downtime = lastread if lastread else done_ms - downstart
    elif downstart:
        downtime = done_ms - downstart
    else:
        downtime = done_ms
    h.append("Downtime: %dms; %dms" % (downtime, downstart))
    h.append("\nTiming: ")
    h.append(format_timing(t, state, downstart))
    h.append("\nIndex: %d\n\n" % int(row.get("index") or 0))

    out = "".join(h).encode("utf-8", errors="replace")
    if writehead:
        head = row.get("head")
        if head:
            out += bytes(head)
        else:
            out += b"\n"  # cli.c:311-315: keep the parser's blank line
    if writebody:
        out += body + b"\n"
    return out


def to_text(results_df, writebody: bool = True,
            writehead: bool = False) -> bytes:
    """Render a whole result DataFrame, ordered by seed index — the
    byte-diff surface vs the reference binary's stdout. Driver-side
    collect; test/debug only."""
    rows = results_df.orderBy("index").collect()
    return b"".join(
        render_output(r.asDict(), writebody, writehead) for r in rows
    )
