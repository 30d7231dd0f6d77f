"""spark-submit job surface: arg parsing, seeds loading, and one
end-to-end subprocess run of minicrawler_spark/jobs/crawl_job.py
(the --py-files deploy path; scripts/submit.sh wraps the same module).
"""

import json
import os
import subprocess
import sys

from minicrawler_spark.jobs.crawl_job import load_seeds, parse_args

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_args_defaults():
    a = parse_args(["--seeds", "s.txt", "--output", "/tmp/o"])
    assert a.timeout == 5 and a.delay == 100 and a.max_redirects == 21
    assert not a.dedup and not a.respect_robots
    assert a.fetcher.endswith(":fixture_fetcher")


def test_load_seeds(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("http://a.test/\n\n# comment\nhttp://b.test/x\n")
    assert load_seeds(str(p)) == ["http://a.test/", "http://b.test/x"]


def test_job_subprocess(tmp_path):
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(
        "http://host0.test/page/0\nhttp://host1.test/teapot\nbogus url\n"
    )
    out = tmp_path / "out"
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    # spark-submit ships the package via --py-files; plain python needs
    # the repo root on PYTHONPATH for the same effect
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [
            sys.executable, "minicrawler_spark/jobs/crawl_job.py",
            "--seeds", str(seeds), "--output", str(out),
            "--timeout", "600", "--max-rounds", "1",
        ],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = next(
        json.loads(l[len("CRAWL_JOB_SUMMARY "):])
        for l in proc.stdout.splitlines()
        if l.startswith("CRAWL_JOB_SUMMARY ")
    )
    assert summary["results"] == 3
    assert summary["by_outcome"].get("done") == 2
    assert summary["by_outcome"].get("error") == 1  # 'bogus url' -> -10
