"""Snapshot-versioned parquet tables: Iceberg-semantics source/sink.

The north rule targets an *Iceberg table* of pages. This container has
no Iceberg runtime jars, so this module provides the load-bearing
subset of Iceberg's table format over plain parquet + JSON manifests —
the same design (a table is a chain of immutable snapshots, each
listing its visible data files; readers pin a snapshot, writers commit
a new one):

- **snapshot isolation / time travel**: ``read(spark, snapshot_id=...)``
  sees exactly the files of that snapshot, regardless of later commits
  (≡ Iceberg ``VERSION AS OF``);
- **append / overwrite commits**: an append snapshot inherits the
  parent's file list and adds new files; an overwrite starts fresh
  (≡ Iceberg's append/overwrite operations);
- **incremental reads**: ``read_incremental(spark, from_id, to_id)``
  scans only files added in (from, to] — the "process just the new
  crawl slice" pattern that keeps a 10^12-row pipeline from re-reading
  the corpus (≡ Iceberg incremental scan);
- **lineage hook**: the committed ``snapshot_id`` is what
  ``plans/checkpoint.py`` records as ``input_snapshot_id`` in its
  per-partition manifests, closing the north rule's lineage loop.

Layout (all writes are write-new-file-then-rename-pointer, so readers
never observe a partial commit):

    <root>/data/<snapshot_id>/part-*.parquet   immutable data files
    <root>/_snapshots/snap-<id>.json           manifest: parent, files
    <root>/_snapshots/_current                 pointer to latest id

Scale notes: manifests hold file *paths*, not row data — a commit is
O(files) driver-side JSON, and reads hand Spark an explicit file list
(no directory listing storm on object stores; this is precisely why
Iceberg exists). File-level min/max pruning is delegated to parquet
footers within each file.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _strip_scheme(path: str) -> str:
    """``input_file_name()`` returns a URI (file:///root/...); manifests
    store plain paths — normalize for set membership."""
    if path.startswith("file://"):
        path = path[len("file://"):]
    return path


class CommitConflictError(RuntimeError):
    """Another writer committed between this commit's parent read and its
    pointer flip — retry on top of the new current snapshot (Iceberg's
    optimistic-concurrency contract: conflicting commits fail, never
    silently drop the other writer's rows)."""


@dataclass
class SnapshotTable:
    root: str

    @property
    def _snap_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    @property
    def _current_path(self) -> str:
        return os.path.join(self._snap_dir, "_current")

    # -- manifest plumbing --------------------------------------------------

    def _manifest_path(self, snapshot_id: str) -> str:
        return os.path.join(self._snap_dir, f"snap-{snapshot_id}.json")

    def _load_manifest(self, snapshot_id: str) -> dict:
        with open(self._manifest_path(snapshot_id)) as f:
            return json.load(f)

    def current_snapshot_id(self) -> str | None:
        try:
            with open(self._current_path) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def snapshots(self) -> list[dict]:
        """Manifest chain from oldest to newest (≡ table history)."""
        out: list[dict] = []
        sid = self.current_snapshot_id()
        while sid is not None:
            m = self._load_manifest(sid)
            out.append(m)
            sid = m["parent_id"]
        return list(reversed(out))

    # -- write path ----------------------------------------------------------

    def _write_data_files(self, df: DataFrame, snapshot_id: str) -> list[str]:
        data_dir = os.path.join(self.root, "data", snapshot_id)
        df.write.mode("error").parquet(data_dir)
        return sorted(
            os.path.join(data_dir, f)
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )

    def commit(self, df: DataFrame, operation: str = "append") -> str:
        """Write ``df``'s rows as new immutable files and commit a new
        snapshot. ``operation``: 'append' keeps the parent's files
        visible; 'overwrite' replaces the logical table contents (old
        files stay on disk for time travel — this is a metadata-only
        delete, like Iceberg)."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown operation {operation!r}")
        snapshot_id = uuid.uuid4().hex[:16]
        new_files = self._write_data_files(df, snapshot_id)
        parent_id = self.current_snapshot_id()
        files = list(new_files)
        if operation == "append" and parent_id is not None:
            files = self._load_manifest(parent_id)["files"] + files
        return self._commit_manifest(
            snapshot_id, parent_id, operation, files, new_files, df.schema.json()
        )

    def _commit_manifest(
        self,
        snapshot_id: str,
        parent_id: str | None,
        operation: str,
        files: list[str],
        added_files: list[str],
        schema_json: str,
        removed_files: list[str] | None = None,
    ) -> str:
        manifest = {
            "snapshot_id": snapshot_id,
            "parent_id": parent_id,
            "operation": operation,
            "files": files,
            "added_files": added_files,
            "schema": schema_json,
            # wall-clock commit time enables FOR SYSTEM_TIME AS OF reads
            # (read(as_of_timestamp=...)); pre-r3 manifests lack it and
            # are treated as 'unknown time' (never matched by timestamp)
            "committed_at": time.time(),
        }
        if removed_files is not None:
            manifest["removed_files"] = removed_files
        os.makedirs(self._snap_dir, exist_ok=True)
        with open(self._manifest_path(snapshot_id), "w") as f:
            json.dump(manifest, f)
        # optimistic-concurrency pointer flip (Iceberg semantics): an
        # O_EXCL lock serializes committers; inside it, verify the pointer
        # still names the parent this manifest was built on. A concurrent
        # commit makes this one FAIL (manifest becomes an orphan — data
        # files are immutable, nothing is corrupted) rather than silently
        # discarding the other writer's rows. Readers still see an atomic
        # old-or-new pointer via os.replace.
        lock = os.path.join(self._snap_dir, "_commit.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(
                f"another commit holds {lock}; retry after it completes"
            ) from None
        try:
            os.close(fd)
            if self.current_snapshot_id() != parent_id:
                raise CommitConflictError(
                    f"concurrent commit: parent moved from {parent_id!r} to "
                    f"{self.current_snapshot_id()!r}; re-read and retry"
                )
            tmp = self._current_path + f".tmp-{snapshot_id}"
            with open(tmp, "w") as f:
                f.write(snapshot_id)
            os.replace(tmp, self._current_path)
        finally:
            os.unlink(lock)
        return snapshot_id

    def delete_where(self, spark: SparkSession, condition) -> str:
        """Copy-on-write row delete (≡ Iceberg DELETE, COW mode): only
        files that actually CONTAIN matching rows are rewritten without
        them; untouched files carry over by reference, and old files
        stay on disk for time travel. At 10^12 rows the affected-file
        census is one pushed-down scan and the rewrite cost is
        proportional to the hit set, not the table.

        Incremental reads across a delete snapshot raise (rows
        disappeared; an add-only delta cannot represent that — Iceberg's
        incremental scan has the same restriction)."""
        from pyspark.sql import functions as F

        parent_id = self.current_snapshot_id()
        if parent_id is None:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        m = self._load_manifest(parent_id)
        cur = self.read(spark, parent_id)
        affected = {
            _strip_scheme(r[0])
            for r in cur.where(condition)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        if not affected:
            return parent_id  # no-op: nothing matched, no new snapshot
        snapshot_id = uuid.uuid4().hex[:16]
        kept_rows = spark.read.parquet(*sorted(affected)).where(~condition)
        new_files = self._write_data_files(kept_rows, snapshot_id)
        files = [f for f in m["files"] if f not in affected] + new_files
        return self._commit_manifest(
            snapshot_id, parent_id, "delete", files, new_files,
            m["schema"], removed_files=sorted(affected),
        )

    def compact(self, spark: SparkSession, target_files: int = 1) -> str:
        """Bin-pack the table's data files into ``target_files`` files
        (≡ Iceberg rewrite_data_files): a pure REWRITE — same logical
        rows, new physical layout — fixing the small-files problem that
        append-heavy 10^12-row tables accumulate (every extra file is a
        task, a footer fetch, and an object-store request). Incremental
        readers skip compaction snapshots entirely: their added files
        carry no new rows."""
        parent_id = self.current_snapshot_id()
        if parent_id is None:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        m = self._load_manifest(parent_id)
        snapshot_id = uuid.uuid4().hex[:16]
        rows = self.read(spark, parent_id).coalesce(target_files)
        new_files = self._write_data_files(rows, snapshot_id)
        return self._commit_manifest(
            snapshot_id, parent_id, "compact", new_files, new_files,
            m["schema"], removed_files=m["files"],
        )

    def rollback_to(self, snapshot_id: str) -> str:
        """Restore the table state of an ancestor snapshot as a NEW
        commit (≡ Iceberg ``rollback_to_snapshot``): the new snapshot
        references the ancestor's exact file list, history is preserved
        (nothing is deleted), and incremental readers crossing it raise
        like they do for deletes — rows may have disappeared."""
        parent_id = self.current_snapshot_id()
        if parent_id is None:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        if snapshot_id not in {m["snapshot_id"] for m in self.snapshots()}:
            raise ValueError(f"{snapshot_id!r} is not an ancestor of the current snapshot")
        target = self._load_manifest(snapshot_id)
        new_id = uuid.uuid4().hex[:16]
        return self._commit_manifest(
            new_id, parent_id, "rollback", target["files"], [], target["schema"],
        )

    def expire_snapshots(self, retain_last: int = 1) -> dict:
        """Metadata + data maintenance (≡ Iceberg ``expire_snapshots``):
        keep only the newest ``retain_last`` snapshots of the current
        chain, physically deleting data files referenced ONLY by expired
        snapshots and their manifests. Time travel to an expired
        snapshot subsequently fails; the retained chain is re-rooted
        (oldest retained manifest gets ``parent_id: null``). Runs under
        the commit lock so a concurrent committer cannot race the
        deletes."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        chain = self.snapshots()  # oldest -> newest
        if len(chain) <= retain_last:
            return {"expired": 0, "deleted_files": 0}
        lock = os.path.join(self._snap_dir, "_commit.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictError(
                f"another commit holds {lock}; retry after it completes"
            ) from None
        try:
            os.close(fd)
            chain = self.snapshots()
            expired, retained = chain[:-retain_last], chain[-retain_last:]
            keep_files = {f for m in retained for f in m["files"]}
            drop_files = {
                f for m in expired for f in m["files"] + m.get("added_files", [])
            } - keep_files
            for f in drop_files:
                try:
                    os.unlink(f)
                except FileNotFoundError:
                    pass
            # re-root the retained chain, then drop expired manifests.
            # Write-temp + os.replace so a crash mid-write can never
            # leave truncated JSON at the root of the live chain (same
            # atomic pointer-flip pattern as the ``_current`` commit).
            root_m = dict(retained[0])
            root_m["parent_id"] = None
            root_path = self._manifest_path(root_m["snapshot_id"])
            tmp_path = root_path + ".tmp"
            with open(tmp_path, "w") as f:
                json.dump(root_m, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp_path, root_path)
            for m in expired:
                try:
                    os.unlink(self._manifest_path(m["snapshot_id"]))
                except FileNotFoundError:
                    pass
        finally:
            os.unlink(lock)
        return {"expired": len(expired), "deleted_files": len(drop_files)}

    # -- read paths ----------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        as_of_timestamp: float | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Read the table as of ``snapshot_id`` (default: current) or,
        with ``as_of_timestamp``, the newest snapshot committed at or
        before that wall-clock time (≡ SQL ``FOR SYSTEM_TIME AS OF``).
        Hands Spark the explicit immutable file list — later commits
        cannot change what this scan sees (snapshot isolation).
        ``merge_schema=True`` unions the file schemas (Iceberg-style
        add-column evolution: appends may widen the schema; rows from
        pre-evolution files read the new columns as null)."""
        if as_of_timestamp is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id OR as_of_timestamp, not both")
            eligible = [
                m for m in self.snapshots()
                if m.get("committed_at") is not None
                and m["committed_at"] <= as_of_timestamp
            ]
            if not eligible:
                raise FileNotFoundError(
                    f"no snapshot at or before timestamp {as_of_timestamp} in {self.root}"
                )
            snapshot_id = eligible[-1]["snapshot_id"]
        sid = snapshot_id or self.current_snapshot_id()
        if sid is None:
            raise FileNotFoundError(f"no snapshots at {self.root}")
        files = self._load_manifest(sid)["files"]
        if not files:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(self._load_manifest(sid)["schema"]))
            return spark.createDataFrame([], schema)
        if merge_schema:
            return spark.read.option("mergeSchema", "true").parquet(*files)
        return spark.read.parquet(*files)

    def read_incremental(
        self, spark: SparkSession, from_id: str | None, to_id: str | None = None
    ) -> DataFrame:
        """Rows added by snapshots in (``from_id``, ``to_id``] — walks
        the manifest chain and scans only the delta files. ``from_id``
        None means 'from the beginning'."""
        to_id = to_id or self.current_snapshot_id()
        delta: list[str] = []
        sid = to_id
        accumulating = True
        while sid is not None and sid != from_id:
            m = self._load_manifest(sid)
            if accumulating:
                op = m["operation"]
                if op in ("delete", "rollback"):
                    # rows disappeared; an add-only delta can't express
                    # that (Iceberg's incremental scan refuses too)
                    raise ValueError(
                        f"incremental read crosses {op} snapshot "
                        f"{m['snapshot_id']!r}; re-read the full table from it"
                    )
                if op == "compact":
                    pass  # pure rewrite: its added files carry no new rows
                else:
                    delta = m["added_files"] + delta
                if op == "overwrite":
                    # an overwrite truncates visibility: files added by
                    # older snapshots are not part of the table at to_id
                    accumulating = False
            sid = m["parent_id"]
        if sid is None and from_id is not None:
            raise ValueError(f"from_id {from_id!r} is not an ancestor of {to_id!r}")
        if not delta:
            return self.read(spark, to_id).limit(0)
        return spark.read.parquet(*delta)
