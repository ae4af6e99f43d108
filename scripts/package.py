"""Build the --py-files artifact: dist/gdal_common_python_spark.zip.

Usage:
    python3 scripts/package.py
    spark-submit --py-files dist/gdal_common_python_spark.zip your_job.py

The zip contains the package only (no tests/data); deterministic entries
(sorted, zeroed timestamps) so repeated builds are byte-identical.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "gdal_common_python_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def build() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                entries.append((os.path.relpath(full, ROOT), full))
    # skip the rebuild when the existing zip is newer than every source AND
    # holds exactly the current file set (a deleted/renamed module must
    # invalidate it) — and write via temp + atomic os.replace so concurrent
    # sessions never observe a partially-written zip
    if os.path.exists(OUT):
        newest_src = max(os.path.getmtime(full) for _, full in entries)
        if os.path.getmtime(OUT) >= newest_src:
            try:
                with zipfile.ZipFile(OUT) as z:
                    if sorted(z.namelist()) == sorted(arc for arc, _ in entries):
                        return OUT
            except zipfile.BadZipFile:
                pass
    tmp = f"{OUT}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, full in sorted(entries):
            info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    os.replace(tmp, OUT)
    return OUT


if __name__ == "__main__":
    print(build())
