"""Build dist/cis455crawler_spark.zip for spark-submit --py-files.

Zips the package with top-level layout (cis455crawler_spark/... inside the
archive) so executors and the driver can import it straight off the zip —
the standard --py-files shape. Usage: python tools/make_dist.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out_zip: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out_zip or os.path.join(repo, "dist", "cis455crawler_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(repo, "cis455crawler_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
