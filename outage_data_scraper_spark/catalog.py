"""Snapshot-versioned Parquet tables with an Iceberg-shaped interface.

The north rule wants crawl state (frontier, seen shards, robots cache)
checkpointed to Iceberg snapshots so a killed job resumes mid-frontier.
This sandbox has no Iceberg jars, so the engine ships a minimal
table-format layer with the same *operations* — append / overwrite /
read-at-snapshot / rollback — backed by plain Parquet directories plus an
atomically-committed JSON manifest. Every call site goes through this
interface, so swapping in `spark.table("catalog.db.t")` + `writeTo(...)`
when Iceberg is on the classpath is a one-file change.

Layout per table::

    <root>/<table>/
        _manifest.json          # {"snapshots": [{"id", "mode", "dir", "wave"}]}
        snap-00000001/part-*.parquet
        snap-00000002/...

Commit protocol: data dir is fully written first, then the manifest is
replaced via os.replace (atomic on POSIX). A reader only sees snapshots
listed in the manifest, so a killed writer leaves at most an orphan data
dir — never a torn table. That is the resumability contract the crawl
wave loop relies on (SURVEY.md §4.3 "Resumable crawl state").
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST = "_manifest.json"


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # per-table commit lock: run_wave commits tables concurrently
        # from a ThreadPoolExecutor — today those writes hit disjoint
        # tables, but the manifest read-modify-write must not silently
        # drop a snapshot if a same-table concurrent write ever appears
        # (Iceberg's optimistic manifest swap plays the same role)
        self._locks: dict[str, threading.Lock] = {}

    # -- manifest helpers ---------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), _MANIFEST)

    def _load_manifest(self, name: str) -> dict:
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return {"snapshots": []}
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        path = self._manifest_path(name)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic commit

    # -- public API (Iceberg-shaped) ----------------------------------------
    def exists(self, name: str) -> bool:
        return bool(self._load_manifest(name)["snapshots"])

    def snapshots(self, name: str) -> list[dict]:
        return self._load_manifest(name)["snapshots"]

    def current_snapshot_id(self, name: str) -> int | None:
        snaps = self.snapshots(name)
        return snaps[-1]["id"] if snaps else None

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "append",
        wave: int | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Append or overwrite; returns the new snapshot id.

        ``wave`` stamps crawl-wave lineage on the snapshot so resume can
        find the last consistent wave across tables. ``partition_by``
        hive-partitions the snapshot's files (the stand-in for Iceberg's
        partition spec — e.g. records PARTITIONED BY (state, layout),
        pages by (url bucket, day), FIXTURES.md §1.1) so scans with
        partition predicates prune files.
        """
        assert mode in ("append", "overwrite")
        # dict.setdefault is atomic under the GIL (defaultdict's
        # __missing__ is not), so two racing first-writers get ONE lock
        with self._locks.setdefault(name, threading.Lock()):
            manifest = self._load_manifest(name)
            snap_id = (manifest["snapshots"][-1]["id"] + 1) if manifest["snapshots"] else 1
            data_dir = os.path.join(self._table_dir(name), f"snap-{snap_id:08d}")
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(data_dir)
            manifest["snapshots"].append(
                {
                    "id": snap_id,
                    "mode": mode,
                    "dir": f"snap-{snap_id:08d}",
                    "wave": wave,
                    "partition_by": partition_by,
                }
            )
            self._commit_manifest(name, manifest)
            return snap_id

    def read(
        self,
        spark: SparkSession,
        name: str,
        snapshot: int | None = None,
        schema: StructType | None = None,
    ) -> DataFrame:
        """Read table state as of ``snapshot`` (default: current).

        State = union of appended snapshots since (and including) the last
        overwrite at or before the requested snapshot — i.e. Iceberg
        time travel over append/replace snapshots.
        """
        snaps = self.snapshots(name)
        if snapshot is not None:
            snaps = [s for s in snaps if s["id"] <= snapshot]
        live: list[dict] = []
        for s in snaps:
            if s["mode"] == "overwrite":
                live = []
            live.append(s)
        if not live:
            if schema is None:
                raise ValueError(f"table {name!r} is empty and no schema given")
            return spark.createDataFrame([], schema)

        def read_one(s: dict):
            path = os.path.join(self._table_dir(name), s["dir"])
            reader = spark.read
            # hive-partitioned snapshots need per-dir discovery; schema is
            # applied only to unpartitioned snapshots (partition columns
            # come back via discovery)
            if schema is not None and not s.get("partition_by"):
                reader = reader.schema(schema)
            return reader.parquet(path)

        dfs = [read_one(s) for s in live]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=False)
        if schema is not None:
            out = out.select(*[f.name for f in schema.fields])
        return out

    def rollback(self, name: str, snapshot: int) -> None:
        """Drop snapshots newer than ``snapshot`` (crash-recovery path)."""
        manifest = self._load_manifest(name)
        keep = [s for s in manifest["snapshots"] if s["id"] <= snapshot]
        dropped = [s for s in manifest["snapshots"] if s["id"] > snapshot]
        self._commit_manifest(name, {"snapshots": keep})
        for s in dropped:
            shutil.rmtree(
                os.path.join(self._table_dir(name), s["dir"]), ignore_errors=True
            )

    def last_wave(self, name: str) -> int | None:
        """Highest wave id committed for this table (resume bookkeeping)."""
        waves = [s.get("wave") for s in self.snapshots(name) if s.get("wave") is not None]
        return max(waves) if waves else None

    def compact(self, spark: SparkSession, name: str, wave: int | None = None) -> int:
        """Rewrite the table's live state as one overwrite snapshot
        (Iceberg's rewrite_data_files analog). Long crawls append one
        snapshot per wave per table; periodic compaction keeps the
        read-side union shallow. Keeps the last snapshot's partition spec.
        Old snapshot dirs are retired from the manifest (readers only see
        the manifest) and removed.

        ``wave`` defaults to the table's last committed wave: resume()
        rolls back any snapshot whose wave exceeds the last wave marker
        and treats wave=None as uncommitted, so an unstamped compaction
        snapshot would be rolled back — deleting the table's only data."""
        snaps = self.snapshots(name)
        if not snaps:
            raise ValueError(f"table {name!r} is empty")
        if wave is None:
            wave = self.last_wave(name)
        partition_by = snaps[-1].get("partition_by")
        current = self.read(spark, name)
        snap_id = self.write(
            name, current, mode="overwrite", wave=wave, partition_by=partition_by
        )
        # drop retired data dirs (everything before the compaction snapshot)
        manifest = self._load_manifest(name)
        keep = [s for s in manifest["snapshots"] if s["id"] >= snap_id]
        retired = [s for s in manifest["snapshots"] if s["id"] < snap_id]
        self._commit_manifest(name, {"snapshots": keep})
        for s in retired:
            shutil.rmtree(
                os.path.join(self._table_dir(name), s["dir"]), ignore_errors=True
            )
        return snap_id

    def drop(self, name: str) -> None:
        shutil.rmtree(self._table_dir(name), ignore_errors=True)
