"""Build the --py-files artifact: dist/data_warehouse_etl_spark.zip.

The zip contains only the package sources (no tests/bench), importable on
every executor via ``spark-submit --py-files dist/data_warehouse_etl_spark.zip``.
Deterministic: fixed timestamps + sorted entries, so re-builds of identical
sources are byte-identical (reproducible deploys).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "data_warehouse_etl_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                abs_path = os.path.join(root, fn)
                entries.append((os.path.relpath(abs_path, REPO), abs_path))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, abs_path in sorted(entries):
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(abs_path, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    print(build())
