"""Build the --py-files zip for spark-submit deployment (north rule).

Usage: python scripts/package.py [out_zip]
Produces dist/breakchecker_spark.zip containing the package, importable
by executors via ``spark-submit --py-files dist/breakchecker_spark.zip``.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, "breakchecker_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # ship package data too (the ICANN PSL snapshot): a
                # .py-only zip silently degrades every executor's
                # suffix resolution to the embedded fallback subset
                if not fn.endswith((".py", ".dat")):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "breakchecker_spark.zip")
    print(build(out))
