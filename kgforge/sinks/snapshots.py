"""Iceberg-style snapshot log over parquet stage directories: versioned
commits, time-travel reads, rollback, optimistic concurrency, and snapshot
expiry — the table-format semantics the north rule's "Iceberg tables"
deployment target provides, re-expressed dependency-free so the engine's
resume/lineage story has real commit isolation under it.

Design (mirrors the public Iceberg spec's mechanics at file granularity):

- DATA FILES ARE IMMUTABLE. Every commit attempt writes its rows into a
  fresh attempt-unique ``data/c{N}-{nonce}/`` directory; nothing ever
  rewrites an existing file (a version-named dir would let a losing racer
  clobber the winner's referenced data).
- A SNAPSHOT is a JSON manifest naming the exact parquet files visible at
  that version (append commits inherit the parent's file list; overwrite
  commits start fresh), plus operation metadata and row counts.
- The CURRENT pointer is a tiny JSON written via ``os.replace`` (atomic on
  POSIX); readers resolve it once and then read only immutable state, so a
  reader never sees a half-committed table.
- OPTIMISTIC CONCURRENCY: the fully-written manifest is published with an
  atomic ``os.link`` onto the version name — two writers racing to commit
  version N+1 cannot both win, and a crash can never leave a half-written
  manifest squatting on the slot; the loser gets ``SnapshotConflict`` and
  retries on the new current (the compare-and-swap loop Iceberg runs
  against its catalog).
- EXPIRY deletes data files no *retained* snapshot references — never
  files a live version can still read.

At cluster scale the JSON manifests would live in the catalog service and
file lists would be manifest-file trees rather than inline arrays; the
commit protocol (immutable data + CAS on a version pointer) is identical.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        self.meta = os.path.join(root, "_snapshots")
        self.data = os.path.join(root, "data")
        os.makedirs(self.meta, exist_ok=True)
        os.makedirs(self.data, exist_ok=True)

    # ------------------------------------------------------------- state

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.meta, f"v{version}.json")

    def current_version(self) -> int | None:
        p = os.path.join(self.meta, "current.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)["version"]

    def snapshot(self, version: int | None = None) -> dict | None:
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        p = self._snap_path(version)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def committed_run_ids(self) -> set:
        """run_ids of every snapshot on the current lineage — the
        idempotence key for replay-safe writers (streaming batch ids)."""
        out = set()
        v = self.current_version()
        while v is not None:
            s = self.snapshot(v)
            if s is None:
                break
            if s.get("run_id"):
                out.add(s["run_id"])
            v = s["parent"]
        return out

    def history(self) -> list[dict]:
        out = []
        v = self.current_version()
        while v is not None:
            s = self.snapshot(v)
            if s is None:
                break
            out.append(
                {k: s[k] for k in ("version", "parent", "operation", "rows", "ts")}
            )
            v = s["parent"]
        return out

    # ------------------------------------------------------------ commit

    def commit(
        self, df: DataFrame, operation: str = "append", run_id: str = ""
    ) -> int:
        """Write ``df``'s rows as a new immutable commit directory and
        publish the next snapshot version. ``operation``: 'append' keeps
        the parent's files visible; 'overwrite' replaces the table
        contents. Raises SnapshotConflict if a concurrent writer won the
        version — callers retry against the new current."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown snapshot operation {operation!r}")
        parent = self.current_version()
        version = (parent or 0) + 1
        # attempt-unique dir, NOT version-named: a losing racer must never
        # overwrite the data files the winning snapshot already references
        # (immutability is what makes time-travel reads safe); losers'
        # orphan dirs are swept by expire()
        commit_dir = os.path.join(self.data, f"c{version}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(commit_dir)
        new_files = sorted(
            os.path.join(dp, f)
            for dp, _dn, fns in os.walk(commit_dir)
            for f in fns
            if f.endswith(".parquet")
        )
        files = list(new_files)
        parent_snap = self.snapshot(parent) if parent is not None else None
        if operation == "append" and parent_snap is not None:
            files = parent_snap["files"] + new_files
        spark = df.sparkSession
        rows = (
            spark.read.parquet(*files).count()
            if files
            else 0
        )
        record = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "run_id": run_id,
            "files": files,
            "rows": rows,
            "ts": time.time(),
        }
        # CAS: the manifest is written COMPLETE to a private tmp name, then
        # published with os.link (fails with EEXIST if another writer won
        # the version). Content and claim are one atomic step — a writer
        # that dies mid-commit leaves only an unlinked tmp file, never a
        # half-written v{N}.json that would poison the version slot for
        # every later committer. Losers' orphaned commit_dirs are reclaimed
        # by expire().
        tmp_manifest = self._snap_path(version) + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp_manifest, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        try:
            os.link(tmp_manifest, self._snap_path(version))
        except FileExistsError:
            raise SnapshotConflict(
                f"version {version} was committed concurrently; retry on the new current"
            ) from None
        finally:
            os.remove(tmp_manifest)
        tmp = os.path.join(self.meta, "current.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, os.path.join(self.meta, "current.json"))
        return version

    # ------------------------------------------------------------- reads

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Time-travel read: the table exactly as of ``version`` (default:
        current). Reads only the snapshot's immutable file list."""
        snap = self.snapshot(version)
        if snap is None:
            raise ValueError(f"no snapshot {'(empty table)' if version is None else version}")
        if not snap["files"]:
            raise ValueError(f"snapshot {snap['version']} has no data files")
        return spark.read.parquet(*snap["files"])

    def rollback(self, version: int) -> None:
        """Point current back at an older snapshot (its files are still on
        disk — data is immutable). Later versions stay readable until
        expired."""
        if self.snapshot(version) is None:
            raise ValueError(f"unknown snapshot version {version}")
        tmp = os.path.join(self.meta, "current.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, os.path.join(self.meta, "current.json"))

    # ------------------------------------------------------------ expiry

    def expire(self, keep_last: int = 2) -> dict:
        """Drop snapshot manifests older than the ``keep_last`` most recent
        on the current lineage and delete data files nothing retained can
        read. Never touches files referenced by a kept snapshot."""
        lineage = []
        v = self.current_version()
        while v is not None:
            s = self.snapshot(v)
            if s is None:
                break
            lineage.append(s)
            v = s["parent"]
        keep = lineage[:keep_last]
        drop = lineage[keep_last:]
        # every manifest on disk that is not kept (includes rolled-back
        # forks and conflict losers' claimed versions)
        kept_versions = {s["version"] for s in keep}
        live_files: set[str] = set()
        for s in keep:
            live_files.update(s["files"])
        removed_files = []
        for fn in sorted(os.listdir(self.meta)):
            if not fn.startswith("v") or not fn.endswith(".json"):
                continue
            ver = int(fn[1:-5])
            if ver in kept_versions:
                continue
            os.remove(os.path.join(self.meta, fn))
        # sweep data dirs for unreferenced parquet files
        for dp, _dn, fns in os.walk(self.data):
            for f in fns:
                p = os.path.join(dp, f)
                if f.endswith(".parquet") and p not in live_files:
                    os.remove(p)
                    removed_files.append(p)
        return {
            "kept_versions": sorted(kept_versions),
            "dropped_versions": sorted(s["version"] for s in drop),
            "removed_files": len(removed_files),
        }
