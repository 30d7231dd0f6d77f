"""Build dist/minicrawler_spark.zip for spark-submit --py-files.

The zip contains the pure-Python package only (no tests, no tools) —
the artifact every executor's PYTHONPATH receives on a real cluster.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.abspath(__file__))
PKG = "minicrawler_spark"
OUT = os.path.join(ROOT, "dist", PKG + ".zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return OUT


if __name__ == "__main__":
    print(build())
