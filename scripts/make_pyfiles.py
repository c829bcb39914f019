#!/usr/bin/env python
"""Package the engine for cluster submission (north_rule: `spark-submit
--py-files`).  Produces a single zip importable on every executor:

    python scripts/make_pyfiles.py            # -> dist/archivesspace_virgo_spark.zip
    spark-submit --py-files dist/archivesspace_virgo_spark.zip \
        scripts/submit_index_build.py --input ... --index-dir ...

Deterministic zip (fixed timestamps, sorted entries) so repeated packaging
of an unchanged tree is byte-identical — the same artifact-hash discipline
the reference applies to its XSLT transforms (IndexRecordsForV4.java:44-64).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "archivesspace_virgo_spark"


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = make_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    print(out)
