"""Snapshot commits, time travel, compaction, and expiry for the
manifest store — the Iceberg *commit model* analog.

The r1-r4 layer (:mod:`.manifest`) is Iceberg's *read side*: a manifest
of per-file zkey/coordinate stats that pruned readers and StageRunner
resume consult.  This module adds the *write side* a 10^12-row table
needs: every mutation is an atomic COMMIT producing a new immutable
snapshot, old snapshots stay readable (time travel), small delta files
get compacted back into the zkey-sorted layout, and unreferenced files
are reclaimed by an explicit expiry pass — nothing is ever deleted as a
side effect of a write.

Layout (all under one table path)::

    table/
      _zcurve_manifest.json          <- pointer: FULL manifest of the
                                        current snapshot (same schema the
                                        r1-r4 readers consume, unchanged)
      _snapshots/manifest.v{N}.json  <- immutable per-snapshot manifests
      data/s{N}/part-*.parquet       <- files added by snapshot N

Commit protocol: write data files -> write the immutable snapshot
manifest (temp + ``os.replace``) -> swing the pointer (temp +
``os.replace``).  A crash between any two steps leaves the previous
snapshot fully intact and at worst orphans files that the next
:meth:`SnapshotStore.expire` reclaims — the same failure contract as an
Iceberg commit.  Concurrency: single writer per table (Iceberg
serializes committers through a catalog CAS; this sandbox has no
catalog, so the contract is documented rather than enforced — readers
are always safe because they only ever see a complete pointer).

Scale notes (100 TB): every operation here is metadata-only on the
driver except the data writes themselves, which are ordinary
distributed ``write.parquet`` jobs.  ``commit`` lists and footer-scans
only the files IT wrote (O(files-added), not O(table)); ``read`` /
``read_pruned`` hand Spark an explicit file list from the manifest, so
scan planning never lists the directory; ``compact`` is one
repartitionByRange job over the files it replaces; ``expire`` deletes
O(dropped-files).  Per-snapshot manifests carry lineage + per-file
metrics, so any downstream stage can resume against a PINNED snapshot
id instead of "whatever the table looks like now" — reproducible
backfills, the property the north rule's per-partition lineage asks
for.

Reference parity: the reference's B-tree is mutated in place page by
page (WAL-protected, sp_tree.c); the Spark-native translation of
"index maintenance" is append -> compact -> expire over immutable
parquet, which is exactly the Iceberg model this mirrors.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .manifest import MANIFEST_NAME, _footer_stats, _write_manifest, load_manifest

SNAP_DIR = "_snapshots"


def _atomic_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
    os.replace(tmp, path)


class SnapshotStore:
    """Versioned manifest store: atomic commits, time travel, compaction,
    snapshot expiry.  See module docstring for the layout and the crash /
    concurrency contract."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, SNAP_DIR), exist_ok=True)

    # -- snapshot metadata ------------------------------------------------
    def _snap_manifest_path(self, sid: int) -> str:
        return os.path.join(self.path, SNAP_DIR, f"manifest.v{sid}.json")

    def current(self) -> dict | None:
        return load_manifest(self.path)

    def snapshot_ids(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.path, SNAP_DIR)):
            if name.startswith("manifest.v") and name.endswith(".json"):
                out.append(int(name[len("manifest.v"):-len(".json")]))
        return sorted(out)

    def snapshots(self) -> list[dict]:
        """History table (one row per snapshot, newest last) — the
        Iceberg ``table.snapshots`` metadata-table analog."""
        rows = []
        for sid in self.snapshot_ids():
            m = self.snapshot(sid)
            rows.append(
                {
                    "snapshot_id": sid,
                    "parent_id": m.get("parent_id"),
                    "operation": m.get("operation"),
                    "created_unix": m.get("created_unix"),
                    "total_rows": m.get("total_rows"),
                    "n_files": len(m.get("files", [])),
                    "summary": m.get("summary", {}),
                }
            )
        return rows

    def snapshot(self, snapshot_id: int | None = None, *, as_of_unix: int | None = None) -> dict:
        """Full manifest of a snapshot: by id, by timestamp (latest
        snapshot with ``created_unix <= as_of_unix``), or current."""
        if snapshot_id is not None and as_of_unix is not None:
            raise ValueError("pass snapshot_id or as_of_unix, not both")
        if snapshot_id is None and as_of_unix is None:
            m = self.current()
            if m is None:
                raise FileNotFoundError(f"no manifest at {self.path}")
            return m
        if as_of_unix is not None:
            best = None
            for sid in self.snapshot_ids():
                m = self.snapshot(sid)
                if m["created_unix"] <= as_of_unix:
                    best = m
            if best is None:
                raise LookupError(f"no snapshot at or before t={as_of_unix}")
            return best
        p = self._snap_manifest_path(snapshot_id)
        if not os.path.exists(p):
            raise LookupError(f"no snapshot v{snapshot_id} at {self.path}")
        with open(p) as fh:
            return json.load(fh)

    # -- commits ----------------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        *,
        operation: str = "append",
        zkey_col: str = "zkey",
        n_partitions: int = 32,
        stat_cols: tuple = ("x", "y"),
        lineage: dict | None = None,
        created_unix: int | None = None,
    ) -> dict:
        """Atomically commit `df` as a new snapshot.

        ``operation='append'`` carries the parent's files forward and
        adds the new ones; ``'overwrite'`` / ``'replace'`` reference only
        the new files (the parent snapshot remains readable until
        expired).  Data is zkey-range-partitioned and sorted within
        partitions — each commit's delta is itself a sorted mini-layout
        with full footer stats, so pruned readers work on appended
        tables too (append-heavy tables re-tighten global clustering via
        :meth:`compact`).

        ``created_unix`` defaults to wall clock; tests pass explicit
        stamps so time-travel-by-timestamp is deterministic.
        """
        if operation not in ("append", "overwrite", "replace"):
            raise ValueError(f"unknown operation {operation!r}")
        cur = self.current()
        parent_id = cur.get("snapshot_id") if cur else None
        if cur is not None and parent_id is None:
            # adopt a plain write_sorted (v1) store: its manifest becomes
            # snapshot 1 with files at the table root
            parent_id = 1
            cur = {**cur, "snapshot_id": 1, "parent_id": None, "operation": "append"}
            _atomic_json(self._snap_manifest_path(1), cur)
            _write_manifest(self.path, cur)
        sid = (parent_id or 0) + 1
        if cur is not None and zkey_col != cur["zkey_col"]:
            raise ValueError(f"zkey_col {zkey_col!r} != table's {cur['zkey_col']!r}")
        data_rel = f"data/s{sid}"
        out_dir = os.path.join(self.path, data_rel)
        (
            df.repartitionByRange(n_partitions, F.col(zkey_col))
            .sortWithinPartitions(zkey_col)
            .write.mode("overwrite")
            .parquet(out_dir)
        )
        new_files = []
        for name in sorted(os.listdir(out_dir)):
            if name.endswith(".parquet"):
                fs = _footer_stats(os.path.join(out_dir, name), zkey_col, stat_cols)
                new_files.append({"file": f"{data_rel}/{name}", **fs})
        carried = list(cur["files"]) if (operation == "append" and cur) else []
        files = carried + new_files
        if created_unix is None:
            import time

            created_unix = int(time.time())
        manifest = {
            "format_version": 2,
            "snapshot_id": sid,
            "parent_id": parent_id,
            "operation": operation,
            "zkey_col": zkey_col,
            "created_unix": created_unix,
            "n_partitions": n_partitions,
            "target_parallelism": n_partitions,
            "total_rows": sum(f["rows"] for f in files),
            "files": files,
            "lineage": lineage or {},
            "metrics": {
                "n_files": len(files),
                "rows_min": min((f["rows"] for f in files), default=0),
                "rows_max": max((f["rows"] for f in files), default=0),
            },
            "summary": {
                "added_files": len(new_files),
                "added_rows": sum(f["rows"] for f in new_files),
                "carried_files": len(carried),
            },
        }
        # immutable snapshot manifest first, pointer swing last: a crash
        # in between leaves the parent current and v{sid} orphaned (safe)
        _atomic_json(self._snap_manifest_path(sid), manifest)
        _write_manifest(self.path, manifest)
        return manifest

    # -- reads ------------------------------------------------------------
    def _paths(self, manifest: dict) -> list[str]:
        return [os.path.join(self.path, f["file"]) for f in manifest["files"]]

    def read(self, snapshot_id: int | None = None, *, as_of_unix: int | None = None) -> DataFrame:
        """Scan a snapshot (current by default).  The file list comes
        from the manifest — no directory listing, and dropping a file
        from a manifest removes it from every future plan instantly."""
        m = self.snapshot(snapshot_id, as_of_unix=as_of_unix)
        paths = self._paths(m)
        if not paths:
            raise LookupError(f"snapshot v{m['snapshot_id']} has no data files")
        return self.spark.read.parquet(*paths)

    def read_pruned(self, intervals, snapshot_id: int | None = None) -> DataFrame:
        """Manifest file pruning (the B-tree descent) against any
        snapshot — time travel composes with interval pruning because
        stats live per file in each snapshot's own manifest."""
        from .manifest import prune_files

        m = self.snapshot(snapshot_id)
        names = prune_files(m, intervals)
        if not names:
            return self.read(snapshot_id).limit(0)
        return self.spark.read.parquet(*[os.path.join(self.path, n) for n in names])

    # -- maintenance ------------------------------------------------------
    def compact(
        self,
        *,
        n_partitions: int | None = None,
        created_unix: int | None = None,
    ) -> dict:
        """Rewrite the CURRENT snapshot into one fresh zkey-sorted layout
        (operation='replace').  Append-heavy tables accumulate per-commit
        mini-layouts whose zkey ranges overlap (each delta spans the full
        key space), degrading file pruning; compaction restores the
        single-sorted-run invariant.  Reads source files and writes new
        ones in the same job — safe because the destination is a fresh
        ``data/s{N}`` directory; the parent snapshot stays readable."""
        cur = self.current()
        if cur is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        return self.commit(
            self.read(),
            operation="replace",
            zkey_col=cur["zkey_col"],
            n_partitions=n_partitions or cur.get("n_partitions", 32),
            lineage={
                "compacted_from": cur.get("snapshot_id"),
                **cur.get("lineage", {}),
            },
            created_unix=created_unix,
        )

    def expire(self, *, keep_last: int = 2, dry_run: bool = False) -> dict:
        """Drop all but the newest `keep_last` snapshots and delete data
        files no kept snapshot references (the current snapshot is
        always kept).  Deletion is explicit and separate from commits —
        a reader pinned to a kept snapshot can never lose files.
        ``dry_run`` reports what would be removed without touching
        anything."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        ids = self.snapshot_ids()
        cur = self.current()
        cur_id = cur.get("snapshot_id") if cur else None
        keep = set(ids[-keep_last:])
        if cur_id is not None:
            keep.add(cur_id)
        drop = [i for i in ids if i not in keep]
        referenced = set()
        for sid in keep:
            referenced.update(f["file"] for f in self.snapshot(sid)["files"])
        removable = set()
        for sid in drop:
            removable.update(
                f["file"] for f in self.snapshot(sid)["files"] if f["file"] not in referenced
            )
        report = {
            "kept_snapshots": sorted(keep),
            "removed_snapshots": drop,
            "removed_files": sorted(removable),
            "dry_run": dry_run,
        }
        if dry_run:
            return report
        for rel in removable:
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                os.remove(p)
        for sid in drop:
            os.remove(self._snap_manifest_path(sid))
        return report
