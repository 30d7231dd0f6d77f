"""Crawl settings — mcrawler_settings + per-URL options as one record
(src/h/minicrawler.h:34-39, struct.h:6-11, cli.c:50-153). Broadcast to
executors; everything is deterministic (virtual clock, no wall time).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlSettings:
    timeout: int = 5                 # seconds (struct.h:7)
    delay: int = 100                 # ms per host slot (struct.h:8)
    max_redirects: int = 21          # struct.h:9
    max_page_size: int = 2 * 1024 * 1024  # struct.h:10-11
    follow_redirects: bool = True    # -l inverts
    gzip: bool = False               # -g
    convert_to_text: bool = False    # -c (html2text the body)
    convert_to_utf8: bool = False    # -8
    customagent: str = ""            # -A
    customheader: str = ""           # -w
    username: str = ""               # -u
    password: str = ""               # -p
    impatient: bool = False          # -i
    # rebuild additions (north rule)
    extract_links: bool = False      # feed <a href>/<img src> into frontier
    dedup: bool = False              # URL-seen anti-join before scheduling
    respect_robots: bool = False     # robots.txt gating
    max_depth: int = 3               # link-following depth budget
    max_rounds: int = 64             # driver-loop bound
    per_host_budget: int = 0         # 0 = unlimited; else top-k per host/round
    hot_host_split: int = 1024       # split a host across partitions every
                                     # k scheduled slots (0 = never split);
                                     # politeness stays correct because the
                                     # wait schedule is computed globally
                                     # before the repartition
    real_time: bool = False          # sleep politeness waits on the wall
                                     # clock (real-network fetchers);
                                     # False = virtual clock (fixtures,
                                     # deterministic tests)
    insecure: bool = False           # -k: skip TLS verification
    disable_http2: bool = False      # -2: don't offer h2 in ALPN
                                     # (MCURL_OPT_DISABLE_HTTP2); default
                                     # offers h2 like the reference's
                                     # cert.c:258
    writehead: bool = False          # -h: keep the raw reply head
    ipv6_only: bool = False          # -6: resolve AAAA only
    use_sharded_seen: bool = False   # URL-seen via plans/seen.SeenFilter
                                     # (bloom-pruned parquet shards) instead
                                     # of the in-memory distinct-union;
                                     # requires checkpoint_dir
    politeness_by_ip: bool = False   # reference-faithful per-IP politeness:
                                     # 64 hash slots over the 16-byte IP
                                     # (time.c:43-96), INCLUDING collision
                                     # semantics (two IPs in one slot share
                                     # the channel). Default stays per-host
                                     # (1:1 on the fixture web; documented
                                     # round-1 deviation).
    fetch_concurrency: int = 64      # in-flight requests per partition in
                                     # real_time mode (the select()
                                     # multiplexer analogue, crawler.c:
                                     # 1809-1860: many parallel requests on
                                     # one thread); 1 = serial. Virtual-
                                     # clock fixture mode has no wall waits
                                     # to overlap, so it stays serial.

    def as_dict(self) -> dict:
        return self.__dict__.copy()
