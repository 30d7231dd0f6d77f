"""robots.txt gating (north-rule addition; RFC 9309 semantics) +
per-round lineage metrics + checkpoint/resume + sharded seen filter.

Fixture rules are deterministic per host (sources/fixtures.py:300):
  host0.test -> Disallow: /private8/  and  Disallow: /page/28
  host1.test -> Disallow: /private2/  and  Crawl-delay: 2
  host2.test -> Disallow: /private3/
"""

import pytest

from minicrawler_spark.config import CrawlSettings
from minicrawler_spark.functions.robots import (
    parse_robots,
    robots_allowed,
)
from minicrawler_spark.streaming.crawl import crawl, resume_frontier

import json


def _rules_json(text, agent="minicrawler"):
    rules, delay = parse_robots(text, agent)
    return json.dumps(rules), delay


# ---------------------------------------------------------------------------
# parser + matcher units (RFC 9309)
# ---------------------------------------------------------------------------


def test_group_selection_longest_token():
    txt = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: mini\nDisallow: /mini\n\n"
        "User-agent: minicrawler\nDisallow: /exact\n"
    )
    rules, _ = parse_robots(txt, "minicrawler")
    assert rules == [(False, "/exact")]
    rules, _ = parse_robots(txt, "minibot")
    assert rules == [(False, "/mini")]
    rules, _ = parse_robots(txt, "otherbot")
    assert rules == [(False, "/all")]


def test_group_merge_and_multi_ua_lines():
    txt = (
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: b\nDisallow: /y\n"
    )
    rules, _ = parse_robots(txt, "b")
    assert (False, "/x") in rules and (False, "/y") in rules
    rules, _ = parse_robots(txt, "a")
    assert rules == [(False, "/x")]


def test_longest_match_and_allow_tie():
    rj, _ = _rules_json(
        "User-agent: *\nDisallow: /page\nAllow: /page/open\n"
    )
    assert not robots_allowed(rj, "/page/closed")
    assert robots_allowed(rj, "/page/open/sub")
    assert robots_allowed(rj, "/other")
    # equal length -> Allow wins (RFC 9309 §2.2.2)
    rj, _ = _rules_json("User-agent: *\nDisallow: /dir/\nAllow: /dirx\n")
    rj2, _ = _rules_json("User-agent: *\nDisallow: /a/b\nAllow: /a/c\n")
    rj3, _ = _rules_json("User-agent: *\nDisallow: /tie\nAllow: /tie\n")
    assert robots_allowed(rj3, "/tie/x")


def test_wildcards_and_anchor():
    rj, _ = _rules_json(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n"
    )
    assert not robots_allowed(rj, "/docs/a.pdf")
    # $ anchors against path+query, so a query suffix escapes the anchor
    assert robots_allowed(rj, "/docs/a.pdf?x=1")
    assert robots_allowed(rj, "/docs/a.pdfx")
    assert not robots_allowed(rj, "/tmp123/x")
    assert robots_allowed(rj, "/tmp123/y")


def test_empty_disallow_and_defaults():
    rj, _ = _rules_json("User-agent: *\nDisallow:\n")
    assert robots_allowed(rj, "/anything")
    assert robots_allowed("[]", "/anything")
    assert robots_allowed(None, "/anything")
    # robots.txt itself is always fetchable
    rj, _ = _rules_json("User-agent: *\nDisallow: /\n")
    assert not robots_allowed(rj, "/deep/page")
    assert robots_allowed(rj, "/robots.txt")


def test_crawl_delay_and_comments():
    txt = (
        "# a comment\n"
        "User-agent: minicrawler\n"
        "Crawl-Delay: 2.5  # trailing\n"
        "Disallow: /p # comment after value\n"
    )
    rules, delay = parse_robots(txt, "minicrawler")
    assert delay == 2.5
    assert rules == [(False, "/p")]


def test_rules_before_any_group_ignored():
    rules, _ = parse_robots("Disallow: /early\nUser-agent: *\nDisallow: /x\n")
    assert rules == [(False, "/x")]


# ---------------------------------------------------------------------------
# end-to-end gating over the fixture web
# ---------------------------------------------------------------------------


def test_robots_gate_e2e(spark):
    seeds = [
        "http://host0.test/page/1",       # allowed
        "http://host0.test/page/28",      # Disallow: /page/28
        "http://host0.test/private8/x",   # Disallow: /private8/
        "http://host2.test/private3/a",   # Disallow: /private3/
        "http://host2.test/page/5",       # allowed
        "http://host2.test/robots.txt",   # always allowed
    ]
    res = crawl(
        spark, seeds, CrawlSettings(timeout=600, respect_robots=True)
    ).cache()
    rows = {r["index"]: r for r in res.collect()}
    assert len(rows) == len(seeds)
    assert rows[0]["outcome"] == "done" and rows[0]["status"] == 200
    for i in (1, 2, 3):
        assert rows[i]["outcome"] == "robots"
        assert rows[i]["error_msg"] == "Disallowed by robots.txt"
    assert rows[4]["outcome"] == "done"
    assert rows[5]["outcome"] == "done" and rows[5]["status"] == 200

    # same seeds without the gate: everything is fetched
    res2 = crawl(spark, seeds, CrawlSettings(timeout=600))
    assert res2.filter("outcome = 'robots'").count() == 0


def test_robots_crawl_delay_schedules(spark):
    """host1.test serves Crawl-delay: 2 -> per-host delay becomes
    2000ms (> settings.delay=100); slot n starts no earlier than
    n*2000ms on the virtual clock."""
    seeds = [f"http://host1.test/page/{i}" for i in range(3)]
    res = crawl(
        spark, seeds, CrawlSettings(timeout=600, respect_robots=True)
    )
    rows = sorted(res.collect(), key=lambda r: r["host_seq"])
    assert [r["outcome"] for r in rows] == ["done"] * 3
    for r in rows:
        assert r["elapsed_ms"] >= r["host_seq"] * 2000


def test_robots_gate_feeds_frontier_crawl(spark):
    """With link extraction on, disallowed discovered links are gated
    too — no fetched URL may match the host's disallow rules."""
    from minicrawler_spark.sources.fixtures import synthetic_seeds

    res = crawl(
        spark,
        synthetic_seeds(4, 2),
        CrawlSettings(
            timeout=600, extract_links=True, dedup=True,
            respect_robots=True, max_depth=2, max_rounds=6,
        ),
    ).cache()
    fetched = [
        (r["host"], r["path_query"])
        for r in res.filter("outcome = 'done' and url is not null").collect()
    ]
    # host0.test blocks /page/28 (seed%3==0); nothing fetched may hit it
    assert ("host0.test", "/page/28") not in fetched
    assert all(not p.startswith("/private") for _, p in fetched)
    denied = res.filter("outcome = 'robots'").count()
    fine = res.filter("outcome = 'done'").count()
    assert fine > 0


# ---------------------------------------------------------------------------
# lineage metrics + checkpoint / resume + sharded seen
# ---------------------------------------------------------------------------


def test_report_metrics(spark):
    report = {}
    res = crawl(
        spark,
        [f"http://host{i % 2}.test/page/{i}" for i in range(6)] + ["bogus"],
        CrawlSettings(timeout=600, dedup=True, respect_robots=True),
        report=report,
    )
    res.count()
    assert len(report["rounds"]) >= 1
    r0 = report["rounds"][0]
    assert r0["round"] == 0
    assert r0["candidates"] == 6          # 'bogus' fails parse, not counted
    assert r0["dedup_dropped"] == 0
    assert r0["robots_denied"] == 0
    parts = r0["partitions"]
    assert sum(p["n"] for p in parts) == 6
    assert all(p["partition_id"] >= 0 for p in parts)


def test_checkpoint_resume_and_metrics_files(spark, tmp_path):
    from minicrawler_spark.sources.fixtures import synthetic_seeds

    ck = str(tmp_path / "ck")
    settings = CrawlSettings(
        timeout=600, extract_links=True, dedup=True, max_depth=2,
        max_rounds=2,
    )
    res = crawl(spark, synthetic_seeds(3, 1), settings, checkpoint_dir=ck)
    res.count()
    # frontier snapshot for round 1 exists and resumes with the schema
    f1 = resume_frontier(spark, ck, 1)
    assert f1.count() > 0
    assert "rawurl" in f1.columns and "priority" in f1.columns
    # resuming round 1 fetches the same URLs the full crawl did in round 1
    full = crawl(
        spark, synthetic_seeds(3, 1),
        CrawlSettings(timeout=600, extract_links=True, dedup=True,
                      max_depth=2, max_rounds=2),
    )
    round1_full = sorted(
        r["url"] for r in full.filter("round = 1 and url is not null").collect()
    )
    resumed = crawl(
        spark, f1,
        CrawlSettings(timeout=600, dedup=True, max_rounds=1),
    )
    round1_resumed = sorted(
        r["url"] for r in resumed.filter("url is not null").collect()
    )
    assert round1_resumed == round1_full
    # per-partition metrics parquet written per round
    m = spark.read.parquet(ck + "/metrics/round=0")
    assert {"partition_id", "outcome", "n"} <= set(m.columns)
    assert m.agg({"n": "sum"}).first()[0] > 0


def test_sharded_seen_matches_inmemory(spark, tmp_path):
    from minicrawler_spark.sources.fixtures import synthetic_seeds

    base = CrawlSettings(
        timeout=600, extract_links=True, dedup=True, max_depth=2,
        max_rounds=4,
    )
    mem = crawl(spark, synthetic_seeds(3, 2), base)
    urls_mem = sorted(
        r["url"] for r in mem.filter("url is not null").collect()
    )
    sh = CrawlSettings(
        timeout=600, extract_links=True, dedup=True, max_depth=2,
        max_rounds=4, use_sharded_seen=True,
    )
    shd = crawl(
        spark, synthetic_seeds(3, 2), sh,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    urls_sh = sorted(
        r["url"] for r in shd.filter("url is not null").collect()
    )
    assert urls_mem == urls_sh
    assert len(set(urls_sh)) == len(urls_sh)  # no URL fetched twice


def test_sharded_seen_requires_checkpoint(spark):
    with pytest.raises(ValueError):
        crawl(
            spark, ["http://host0.test/page/1"],
            CrawlSettings(dedup=True, use_sharded_seen=True),
        )


def test_seen_set_survives_resume(spark, tmp_path):
    """VERDICT r1 #10: with a checkpoint_dir the seen set lives in the
    sharded filter's parquet+sidecars, so a crawl resumed after a kill
    at round k never re-fetches a URL crawled before the kill."""
    from minicrawler_spark.sources.fixtures import synthetic_seeds

    ck = str(tmp_path / "ck")
    settings = CrawlSettings(
        timeout=600, extract_links=True, dedup=True, max_depth=3,
        max_rounds=2,
    )
    first = crawl(spark, synthetic_seeds(3, 1), settings, checkpoint_dir=ck)
    crawled = {r["url"] for r in first.filter("url is not null").collect()}

    # "crash": new crawl() call resumed from the snapshot + SAME
    # checkpoint_dir -> SeenFilter reloads its manifest
    resumed = crawl(
        spark,
        resume_frontier(spark, ck, 2),
        CrawlSettings(timeout=600, extract_links=True, dedup=True,
                      max_depth=3, max_rounds=2),
        checkpoint_dir=ck,
    )
    resumed_urls = [
        r["url"] for r in resumed.filter("url is not null").collect()
    ]
    assert resumed_urls, "resume should fetch the next rounds"
    assert not (set(resumed_urls) & crawled), "re-fetched seen URLs"
    assert len(set(resumed_urls)) == len(resumed_urls)
