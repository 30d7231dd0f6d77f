"""argv-compatible CLI (minicrawler_spark/cli.py vs src/cli.c:50-153):
option parsing quirks, and one end-to-end subprocess run over the
fixture web producing the reference's output record format."""

import os
import subprocess
import sys

from minicrawler_spark.cli import parse_argv

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_attached_and_separated_flags():
    seeds, kw, writehead, fixture = parse_argv(
        ["-t7", "-D250", "-pSECRET", "-m4", "-g", "-8", "-i", "-k", "-l",
         "-u", "usr", "-A", "agent/%version%", "-w", "X-H: 1",
         "http://a.test/x"]
    )
    assert kw["timeout"] == 7 and kw["delay"] == 250
    assert kw["password"] == "SECRET" and kw["username"] == "usr"
    assert kw["max_page_size"] == 4 * 1024 * 1024
    assert kw["gzip"] and kw["convert_to_utf8"] and kw["impatient"]
    assert kw["insecure"] and kw["follow_redirects"] is False
    assert kw["customagent"] == "agent/5.2.7"
    assert kw["customheader"] == "X-H: 1\r\n"
    assert seeds == [{"url": "http://a.test/x", "cookies": []}]


def test_parse_url_options_bind_to_next_url():
    seeds, kw, _, _ = parse_argv(
        ["-w", "X-K: %", "-P", "a=1", "http://a.test/p",
         "-X", "DELETE", "http://b.test/d",
         "-C", "val", "http://c.test/c",
         "http://d.test/plain"]
    )
    assert seeds[0]["post"] == b"a=1" and seeds[0]["method"] == "POST"
    assert seeds[1]["method"] == "DELETE" and "post" not in seeds[1]
    assert seeds[2]["customheader"] == "X-K: val\r\n"
    assert "customheader" not in seeds[3]


def test_parse_cookie_jar():
    jar = "a.test\t1\t/\t0\t1999999999\tk\tv\nb.test\t0\t/p\t1\t1999999999\tn\tw"
    seeds, _, _, _ = parse_argv(["-b", jar, "http://a.test/"])
    assert len(seeds[0]["cookies"]) == 2
    assert seeds[0]["cookies"][0]["name"] == "k"
    assert seeds[0]["cookies"][1]["secure"] is True


def test_cli_subprocess_fixture_web():
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [sys.executable, "-m", "minicrawler_spark.cli", "--fixture",
         "-t600", "-h", "http://host0.test/redirect/2",
         "-P", "x=9", "http://host3.test/post"],
        cwd=ROOT, env=env, capture_output=True, timeout=300,
    )
    out = proc.stdout.decode("utf-8", errors="replace")
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "URL: http://host0.test/redirect/2" in out
    assert "Redirected-To: http://host0.test/get" in out
    assert out.count("Redirect-info: ") == 2
    assert "HTTP/1.1 200 OK" in out          # -h raw head block
    assert "URL: http://host3.test/post" in out
    assert "method=POST len=3 body=x=9" in out
    assert "Index: 0" in out and "Index: 1" in out


def test_bare_attached_value_options_are_not_seeds():
    """strncmp semantics (cli.c:78-79,99,101): bare '-t'/'-D'/'-p'/'-m'
    are attached-value options with an empty value (atoi("") == 0),
    never seed URLs; non-numeric suffixes also parse as atoi (0)."""
    from minicrawler_spark.cli import parse_argv

    seeds, kw, _, _ = parse_argv(["-t", "-D", "-p", "-m", "http://a.com/"])
    assert [s["url"] for s in seeds] == ["http://a.com/"]
    assert kw["timeout"] == 0
    assert kw["delay"] == 0
    assert kw["password"] == ""
    assert kw["max_page_size"] == 0
    seeds, kw, _, _ = parse_argv(["-tXY", "http://a.com/"])
    assert kw["timeout"] == 0 and len(seeds) == 1


def test_truncated_value_option_is_usage_error():
    import pytest

    from minicrawler_spark.cli import UsageError, parse_argv

    for flag in ("-w", "-A", "-u", "-b", "-P", "-X"):
        with pytest.raises(UsageError):
            parse_argv(["http://a.com/", flag])
    # -C at end of argv with a pending -w header is also truncated
    with pytest.raises(UsageError):
        parse_argv(["-w", "X-K: %", "-C"])


def test_cli_warc_flag(tmp_path):
    """--warc DIR (addition beyond the reference grammar): the same
    crawl also lands as .warc.gz + .cdxj archives."""
    import glob
    import gzip

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["PYSPARK_PYTHON"] = sys.executable
    out_dir = str(tmp_path / "archive")
    proc = subprocess.run(
        [sys.executable, "-m", "minicrawler_spark.cli", "--fixture",
         "-t600", "--warc", out_dir, "http://host0.test/page/0"],
        cwd=ROOT, env=env, capture_output=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "URL: http://host0.test/page/0" in proc.stdout.decode()
    assert "warc: 1 records" in proc.stderr.decode()
    warcs = glob.glob(out_dir + "/*.warc.gz")
    assert len(warcs) == 1
    rec = gzip.decompress(open(warcs[0], "rb").read())
    assert b"WARC-Target-URI: http://host0.test/page/0" in rec
    assert glob.glob(out_dir + "/*.cdxj")
