"""Scaling-efficiency evidence (north rule: >= 0.8 from N to 4N).

No real cluster in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[8] vs local[32] on the
same input — and we report throughput at both plus the efficiency
ratio. Each level runs in its own subprocess (a JVM can't change
master); results land in SCALING.json and are folded into BENCH.md.

Usage: python tools_scaling.py [frontier_n]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
cpus = int(sys.argv[1]); n = int(sys.argv[2])
from bench import build_spark, bench_frontier, bench_crawl
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
# warm the JVM + python workers with a small run, then measure
bench_frontier(spark, 50000)
fr = bench_frontier(spark, n)
cr = bench_crawl(spark)
print("SCALEOUT " + json.dumps({"cpus": cpus, "frontier": fr, "crawl": cr}))
"""


def run_level(cpus: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALEOUT "):
            return json.loads(line[len("SCALEOUT "):])
    raise RuntimeError("no result from cpus=%d: %s" % (cpus, out.stderr[-2000:]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lo = run_level(8, n)
    hi = run_level(32, n)
    eff_frontier = (hi["frontier"]["urls_per_sec"] / lo["frontier"]["urls_per_sec"]) / 4.0
    eff_crawl = (hi["crawl"]["pages_per_sec"] / lo["crawl"]["pages_per_sec"]) / 4.0
    result = {
        "frontier_n": n,
        "local8": {
            "frontier_urls_per_sec": round(lo["frontier"]["urls_per_sec"], 1),
            "crawl_pages_per_sec": round(lo["crawl"]["pages_per_sec"], 2),
        },
        "local32": {
            "frontier_urls_per_sec": round(hi["frontier"]["urls_per_sec"], 1),
            "crawl_pages_per_sec": round(hi["crawl"]["pages_per_sec"], 2),
        },
        "scaling_efficiency_frontier": round(eff_frontier, 3),
        "scaling_efficiency_crawl": round(eff_crawl, 3),
    }
    with open("SCALING.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
