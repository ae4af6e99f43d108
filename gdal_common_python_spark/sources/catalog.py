"""Table catalog (S1-S5, features.py:27-76 analogs).

The reference guesses an OGR driver from the path/conn string
(features.py:27-43: .shp, 'PG:', .gdb, .sde). Here the registry maps a path
or name to a Spark reader; the engine-owned tables use an Iceberg-layout
directory (data files + a JSON manifest committed by atomic rename) so jobs
get snapshot-consistent reads without Iceberg jars (none in this sandbox —
SURVEY §7 step 0). When a real Iceberg catalog is configured
(spark.sql.catalog.*), ``load`` passes straight through to it.

Iceberg-analog feature set (the parts that matter at 10^12 rows):

- snapshot isolation: readers resolve ONE manifest version; concurrent
  appends commit new versions by atomic rename and never disturb a
  running read;
- time travel: ``read(version=N)`` / ``history()`` — every manifest
  version is retained;
- per-file column stats in the manifest (``stats_cols``): min/max per
  data file, gathered in ONE Spark job at commit time (grouped by
  ``input_file_name``, not a per-file driver loop);
- manifest-level file pruning: ``read(ranges={col: (lo, hi)})`` opens
  only files whose recorded [min,max] intersects the predicate — file
  skipping BEFORE Spark lists/opens anything. Combined with
  ``operators.layout.layout_by_zorder`` (disjoint per-file Z-key
  ranges), a bbox query on a 100 TB corpus touches a few files instead
  of all of them.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


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
    north rule's checkpoint/resume needs, plus time travel and
    stats-based file pruning (module docstring)."""

    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.meta_dir = os.path.join(table_dir, "metadata")

    # ---------------------------------------------------------- manifests

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.meta_dir):
            return []
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def _manifest(self, version: int | None = None) -> dict | None:
        versions = self._versions()
        if not versions:
            return None
        v = versions[-1] if version is None else version
        if v not in versions:
            raise FileNotFoundError(f"no snapshot v{v} in {self.dir} (have {versions})")
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as fh:
            return json.load(fh)

    def _latest_manifest(self) -> dict | None:
        return self._manifest(None)

    def history(self) -> list[dict]:
        """One summary row per committed snapshot (Iceberg ``.history``)."""
        out = []
        for v in self._versions():
            m = self._manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "committed_ms": m.get("committed_ms"),
                    "operation": m.get("operation"),
                    "n_files": len(m["files"]),
                    "n_rows": m.get("n_rows"),
                }
            )
        return out

    # ---------------------------------------------------------- read path

    def _entries(self, m: dict) -> list[dict]:
        """Manifest file entries, tolerating the v0 plain-string layout."""
        return [{"path": f} if isinstance(f, str) else f for f in m["files"]]

    def plan_files(
        self,
        version: int | None = None,
        ranges: dict[str, tuple] | None = None,
    ) -> list[str]:
        """The data files a read would open, after manifest-stats pruning.

        A file survives iff, for every (col, (lo, hi)) in ``ranges``, its
        recorded [min, max] intersects [lo, hi]. Files without stats for a
        referenced column are kept (pruning must never lose rows)."""
        m = self._manifest(version)
        if m is None or not m["files"]:
            raise FileNotFoundError(f"no committed snapshot in {self.dir}")
        picked = []
        for e in self._entries(m):
            keep = True
            for col, (lo, hi) in (ranges or {}).items():
                st = (e.get("stats") or {}).get(col)
                if st is None:
                    continue
                if (hi is not None and st["min"] is not None and st["min"] > hi) or (
                    lo is not None and st["max"] is not None and st["max"] < lo
                ):
                    keep = False
                    break
            if keep:
                picked.append(os.path.join(self.data_dir, e["path"]))
        return picked

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        ranges: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Snapshot read; ``version`` time-travels, ``ranges`` prunes files
        via manifest stats (the residual filter still belongs to the
        caller — pruning only narrows the file list)."""
        files = self.plan_files(version=version, ranges=ranges)
        if not files:
            # all files pruned: empty frame with the snapshot's schema
            m = self._manifest(version)
            all_files = [os.path.join(self.data_dir, e["path"]) for e in self._entries(m)]
            return spark.read.parquet(all_files[0]).limit(0)
        return spark.read.parquet(*files)

    # --------------------------------------------------------- write path

    def _file_stats(
        self, spark: SparkSession, staged_dir: str, stats_cols: list[str]
    ) -> tuple[list[dict], int]:
        """Per-file min/max + row counts for the staged snapshot, in ONE
        Spark job: group the staged files by input_file_name (no per-file
        driver loop — at corpus scale a commit may stage thousands of
        files)."""
        df = spark.read.parquet(staged_dir)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
        rows = (
            df.groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs)
            .collect()
        )
        out, total = [], 0
        for r in rows:
            name = os.path.basename(r["__f"])
            stats = {
                c: {"min": r[f"__min_{c}"], "max": r[f"__max_{c}"]} for c in stats_cols
            }
            out.append({"name": name, "n_rows": r["__n"], "stats": stats})
            total += r["__n"]
        return out, total

    def _commit(
        self,
        df: DataFrame,
        operation: str,
        stats_cols: list[str] | None = None,
        carry: list[dict] | None = None,
    ) -> dict:
        """Stage ``df`` as a new snapshot. File list by operation:
        'append' = prev entries + staged; 'overwrite' = staged only;
        any operation with ``carry`` set = carry entries + staged (the
        copy-on-write merge path)."""
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)
        staged = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.data_dir, staged)
        df.write.mode("overwrite").parquet(out)

        spark = df.sparkSession
        new_entries: list[dict] = []
        n_new = None
        if stats_cols:
            per_file, n_new = self._file_stats(spark, out, stats_cols)
            by_name = {p["name"]: p for p in per_file}
            for f in sorted(os.listdir(out)):
                if not f.endswith(".parquet"):
                    continue
                p = by_name.get(f, {})
                new_entries.append(
                    {
                        "path": os.path.join(staged, f),
                        "n_rows": p.get("n_rows"),
                        "stats": p.get("stats", {}),
                    }
                )
        else:
            new_entries = [
                {"path": os.path.join(staged, f)}
                for f in sorted(os.listdir(out))
                if f.endswith(".parquet")
            ]

        prev = self._latest_manifest()
        if carry is not None:
            files = list(carry) + new_entries
            carried_rows = [e.get("n_rows") for e in carry]
            n_rows = (
                sum(carried_rows) + n_new
                if n_new is not None and all(r is not None for r in carried_rows)
                else None
            )
        elif operation == "append" and prev:
            files = self._entries(prev) + new_entries
            prev_rows = prev.get("n_rows")
            n_rows = (prev_rows + n_new) if (prev_rows is not None and n_new is not None) else None
        else:
            files = new_entries
            n_rows = n_new
        version = (prev["version"] + 1) if prev else 1
        manifest = {
            "version": version,
            "operation": operation,
            "committed_ms": int(time.time() * 1000),
            "schema": df.schema.jsonValue(),
            "n_rows": n_rows,
            "files": files,
        }
        tmp = os.path.join(self.meta_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.meta_dir, f"v{version}.json"))
        return manifest

    def append(self, df: DataFrame, stats_cols: list[str] | None = None) -> None:
        self._commit(df, "append", stats_cols)

    def overwrite(self, df: DataFrame, stats_cols: list[str] | None = None) -> None:
        self._commit(df, "overwrite", stats_cols)

    def merge_by_key(
        self,
        df: DataFrame,
        key_col: str,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Copy-on-write upsert (Iceberg MERGE shape): rows of ``df`` replace
        current rows with the same ``key_col`` value; all other rows are
        untouched. The write amplification is bounded by manifest stats:
        only data files whose recorded [min, max] of ``key_col`` intersects
        the incoming key range are rewritten — every other file carries over
        into the new snapshot BY REFERENCE (no read, no write). That is the
        property that makes point-updates on a 100 TB table affordable, and
        it degrades safely: files without key stats are treated as affected.

        Returns {"rewritten": n_files_rewritten, "carried": n_files_kept}.
        ``stats_cols`` defaults to [key_col] so future merges keep pruning.
        """
        spark = df.sparkSession
        stats_cols = stats_cols if stats_cols is not None else [key_col]
        prev = self._latest_manifest()
        if prev is None or not prev["files"]:
            self._commit(df, "merge", stats_cols)
            return {"rewritten": 0, "carried": 0}
        lo, hi = df.agg(F.min(key_col), F.max(key_col)).collect()[0]
        affected = set(self.plan_files(ranges={key_col: (lo, hi)}))
        entries = self._entries(prev)
        carried = [
            e for e in entries if os.path.join(self.data_dir, e["path"]) not in affected
        ]
        if affected:
            old = spark.read.parquet(*sorted(affected))
            rewritten = old.join(
                df.select(F.col(key_col).alias("__k")).distinct(),
                old[key_col] == F.col("__k"),
                "left_anti",
            ).unionByName(df)
        else:
            rewritten = df
        m = self._commit(rewritten, "merge", stats_cols, carry=carried)
        return {
            "rewritten": len(affected),
            "carried": len(carried),
            "version": m["version"],
        }

    def optimize(
        self,
        spark: SparkSession,
        sort_col: str | None = None,
        num_files: int | None = None,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Compaction (Iceberg rewrite_data_files / Delta OPTIMIZE analog):
        rewrite the current snapshot into ``num_files`` files, range-sorted
        by ``sort_col`` when given — with a Z-order key column (see
        operators.layout.layout_by_zorder) this IS OPTIMIZE ZORDER: the
        rewritten files get tight disjoint key ranges, so the manifest
        stats prune reads that the original small-file layout could not.
        Commits a new snapshot (operation 'optimize'); history keeps the
        old one. Returns {"files_before": ..., "files_after": ...}."""
        before = self.plan_files()
        df = self.read(spark)
        if sort_col is not None:
            df = (
                df.repartitionByRange(num_files, sort_col)
                if num_files
                else df.repartitionByRange(sort_col)
            ).sortWithinPartitions(sort_col)
        elif num_files:
            df = df.coalesce(num_files)
        stats = stats_cols if stats_cols is not None else ([sort_col] if sort_col else None)
        m = self._commit(df, "optimize", stats)
        return {
            "files_before": len(before),
            "files_after": len(self._entries(m)),
            "version": m["version"],
        }

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Vacuum (Iceberg expire_snapshots analog): drop all but the last
        ``keep_last`` manifest versions and DELETE data files referenced by
        no surviving version. Time travel to expired versions is gone —
        that is the contract. Returns {"versions_dropped", "files_deleted"}.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self._versions()
        keep, drop = versions[-keep_last:], versions[:-keep_last]
        live: set[str] = set()
        for v in keep:
            live.update(e["path"] for e in self._entries(self._manifest(v)))
        deleted = 0
        for v in drop:
            for e in self._entries(self._manifest(v)):
                if e["path"] in live:
                    continue
                p = os.path.join(self.data_dir, e["path"])
                if os.path.exists(p):
                    os.remove(p)
                    deleted += 1
                live.add(e["path"])  # count each dead file once
            os.remove(os.path.join(self.meta_dir, f"v{v}.json"))
        # prune empty staging dirs left behind
        if os.path.isdir(self.data_dir):
            for d in os.listdir(self.data_dir):
                full = os.path.join(self.data_dir, d)
                if os.path.isdir(full) and not os.listdir(full):
                    os.rmdir(full)
        return {"versions_dropped": len(drop), "files_deleted": deleted}

    def diff(self, spark: SparkSession, v_old: int, v_new: int) -> DataFrame:
        """Row-level snapshot diff (change-data-feed shape): the multiset
        difference between two committed versions, tagged with
        `_change` = 'added' / 'removed'."""
        old, new = self.read(spark, version=v_old), self.read(spark, version=v_new)
        added = new.exceptAll(old).withColumn("_change", F.lit("added"))
        removed = old.exceptAll(new).withColumn("_change", F.lit("removed"))
        return added.unionByName(removed)
