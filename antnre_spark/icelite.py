"""IcebergLite — a thin, swap-compatible stand-in for Iceberg tables
(SURVEY.md §7.4; the sandbox has no Iceberg runtime jars and no network).

Mirrors the four Iceberg operations the pipeline needs — load, append,
overwrite_partitions, incremental read — over parquet + JSON manifests:

  table/
    data/snap-<n>/[pcol=val/...]part-*.parquet     immutable data files
    manifests/snap-<n>.json                        snapshot manifest

A snapshot manifest lists every live file (path relative to the table root,
row count, partition values parsed from the path) plus the parent snapshot
id. Commit = write data files, then atomically os.rename a tmp manifest
into place — readers only ever see fully-committed snapshots (linear
history, single writer: sufficient for this pipeline's per-stage commits).
Manifest-level partition values give Iceberg-style partition pruning: load()
filters the file list BEFORE Spark ever touches the filesystem.

When real Iceberg jars exist, each call maps 1:1 onto
``spark.read.format("iceberg")`` / ``df.writeTo(...)`` — the facade is the
only file that changes.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IceLite:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "manifests")

    # ---- snapshot bookkeeping ------------------------------------------

    def snapshots(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    def current_snapshot(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def manifest(self, snapshot: int) -> dict:
        with open(os.path.join(self.manifest_dir, f"snap-{snapshot}.json")) as f:
            return json.load(f)

    def _commit(self, files: list[dict], parent: int | None, op: str) -> int:
        os.makedirs(self.manifest_dir, exist_ok=True)
        snap = (parent if parent is not None else -1) + 1
        manifest = {
            "snapshot": snap,
            "parent": parent,
            "operation": op,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            "committed_at_unix": int(time.time()),
        }
        tmp = os.path.join(self.manifest_dir, f".tmp-snap-{snap}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
        os.rename(tmp, os.path.join(self.manifest_dir, f"snap-{snap}.json"))  # atomic
        return snap

    # ---- writes ---------------------------------------------------------

    def _write_files(
        self, df: DataFrame, snap: int, partition_by: list[str] | None
    ) -> list[dict]:
        """Write df under data/snap-<n>/ and return manifest file entries."""
        out_dir = os.path.join(self.data_dir, f"snap-{snap}")
        tmp_dir = os.path.join(self.data_dir, f".tmp-snap-{snap}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp_dir)
        files: list[dict] = []
        for root, _dirs, names in os.walk(tmp_dir):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                rel_in_snap = os.path.relpath(full, tmp_dir)
                partitions = {}
                for seg in rel_in_snap.split(os.sep)[:-1]:
                    if "=" in seg:
                        col, val = seg.split("=", 1)
                        partitions[col] = val
                files.append(
                    {
                        "path": os.path.join(f"snap-{snap}", rel_in_snap),
                        "rows": pq.read_metadata(full).num_rows,
                        "partitions": partitions,
                    }
                )
        os.rename(tmp_dir, out_dir)
        return files

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        parent = self.current_snapshot()
        snap = (parent if parent is not None else -1) + 1
        new_files = self._write_files(df, snap, partition_by)
        live = self.manifest(parent)["files"] if parent is not None else []
        return self._commit(live + new_files, parent, "append")

    def overwrite_partitions(
        self, df: DataFrame, partition_by: list[str]
    ) -> int:
        """Replace every live file whose partition values appear in df
        (dynamic partition overwrite — the idempotent re-extract primitive,
        SURVEY.md §2.J)."""
        parent = self.current_snapshot()
        snap = (parent if parent is not None else -1) + 1
        new_files = self._write_files(df, snap, partition_by)
        replaced = {
            tuple(sorted(f["partitions"].items())) for f in new_files
        }
        live = self.manifest(parent)["files"] if parent is not None else []
        kept = [
            f
            for f in live
            if tuple(sorted(f["partitions"].items())) not in replaced
        ]
        return self._commit(kept + new_files, parent, "overwrite_partitions")

    # ---- reads ----------------------------------------------------------

    def _read_files(self, spark: SparkSession, files: list[dict]) -> DataFrame | None:
        if not files:
            return None
        # group by snapshot dir so partition-dir columns resolve via basePath
        by_snap: dict[str, list[str]] = {}
        for f in files:
            snap_dir = f["path"].split(os.sep)[0]
            by_snap.setdefault(snap_dir, []).append(
                os.path.join(self.data_dir, f["path"])
            )
        dfs = []
        for snap_dir, paths in sorted(by_snap.items()):
            base = os.path.join(self.data_dir, snap_dir)
            dfs.append(spark.read.option("basePath", base).parquet(*paths))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def load(
        self,
        spark: SparkSession,
        snapshot: int | None = None,
        partition_filter: dict[str, list[str]] | None = None,
    ) -> DataFrame | None:
        """Read a snapshot (default: latest). partition_filter prunes files
        via manifest partition values — no listing, no footer reads."""
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None:
            return None
        files = self.manifest(snap)["files"]
        if partition_filter:
            files = [
                f
                for f in files
                if all(
                    f["partitions"].get(col) in set(vals)
                    for col, vals in partition_filter.items()
                )
            ]
        return self._read_files(spark, files)

    def incremental(
        self, spark: SparkSession, since_snapshot: int | None
    ) -> DataFrame | None:
        """Files added strictly after ``since_snapshot`` (Iceberg
        incremental-read semantics via manifest diff)."""
        current = self.current_snapshot()
        if current is None:
            return None
        new = self.manifest(current)["files"]
        if since_snapshot is not None:
            old_paths = {f["path"] for f in self.manifest(since_snapshot)["files"]}
            new = [f for f in new if f["path"] not in old_paths]
        return self._read_files(spark, new)

    def total_rows(self, snapshot: int | None = None) -> int:
        snap = snapshot if snapshot is not None else self.current_snapshot()
        if snap is None:
            return 0
        return self.manifest(snap)["total_rows"]


def with_bucket(df: DataFrame, col: str, n_buckets: int) -> DataFrame:
    """Iceberg-style bucket(col, N) partition transform as a column."""
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int"))
