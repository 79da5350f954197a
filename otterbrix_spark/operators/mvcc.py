"""Multi-version concurrency control for managed tables — snapshot
isolation with optimistic, first-committer-wins conflict detection.

This is the in-repo equivalent of the reference's transaction layer
(`components/table/transaction.hpp:38-62` snapshot acquisition,
`components/table/transaction_manager.hpp` commit/conflict arbitration),
re-expressed for immutable parquet on a shared filesystem:

  * every committed state is an immutable version directory
    ``<root>/_versions/v{N}`` (parquet, write-once);
  * ``<root>/_current`` is a one-line pointer file naming the live
    version, replaced atomically (write-temp + ``os.rename``), so readers
    always observe a complete version — never a half-written directory;
  * a READER pins the version number at snapshot time and keeps reading
    that directory no matter how many commits land afterwards (repeatable
    reads without blocking writers);
  * a WRITER captures its base version at begin, builds the replacement
    DataFrame against that snapshot, and at commit — under the same flock
    writer mutex round 3 introduced — re-reads the pointer: if another
    transaction committed first, ``WriteConflict`` is raised and NOTHING
    is changed (abort = forget; the staged directory is removed). This is
    exactly the reference's first-committer-wins rule, and the standard
    optimistic-concurrency loop (retry from a fresh snapshot) composes on
    top.

Scale posture: version directories are plain parquet — Spark scans them
with full pushdown; the pointer swap is O(1) metadata regardless of table
size. On a multi-host object store the SAME protocol is what Delta/Iceberg
implement with a log instead of a pointer file (their conflict check is
file-level rather than table-level); this class keeps the API so that
backend is a drop-in — the documented seam, now with the single-host
semantics actually implemented rather than only delegated.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from otterbrix_spark.operators.dml import table_write_lock


class WriteConflict(Exception):
    """Another transaction committed after this one's snapshot was taken
    (first-committer-wins). Retry from a fresh snapshot."""


class VersionedTable:
    """Parquet-backed table with MVCC snapshots and optimistic commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self._versions_dir = os.path.join(self.root, "_versions")
        self._pointer = os.path.join(self.root, "_current")

    # -- bootstrap -----------------------------------------------------------
    @classmethod
    def create(cls, spark: SparkSession, root: str, source: DataFrame) -> "VersionedTable":
        t = cls(spark, root)
        os.makedirs(t._versions_dir, exist_ok=True)
        if not t.exists() and os.path.exists(t._version_path(1)):
            # crashed create: v1 was written but the pointer never
            # landed, so exists() is False and a retrying caller would
            # hit errorifexists forever — clear the orphan and redo
            # (the commit path's orphan cleanup does not cover create;
            # self-review r13 pass 3)
            import shutil

            shutil.rmtree(t._version_path(1), ignore_errors=True)
        source.write.mode("errorifexists").parquet(t._version_path(1))
        t._set_pointer(1)
        return t

    def exists(self) -> bool:
        return os.path.isfile(self._pointer)

    # -- version bookkeeping -------------------------------------------------
    def _version_path(self, n: int) -> str:
        return os.path.join(self._versions_dir, f"v{n}")

    def current_version(self) -> int:
        with open(self._pointer) as f:
            return int(f.read().strip())

    def _set_pointer(self, n: int) -> None:
        # write-temp + rename: the pointer is replaced atomically, so a
        # concurrent reader sees either the old or the new version number,
        # never a torn write
        tmp = self._pointer + "." + uuid.uuid4().hex
        with open(tmp, "w") as f:
            f.write(str(n))
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._pointer)

    # -- reads ---------------------------------------------------------------
    def snapshot(self) -> tuple[int, DataFrame]:
        """Pin the current version: the returned DataFrame keeps reading
        that version's directory however many commits land afterwards."""
        n = self.current_version()
        return n, self.as_of(n)

    def as_of(self, version: int) -> DataFrame:
        """Time travel: read a specific committed version."""
        path = self._version_path(version)
        if not os.path.isdir(path):
            raise ValueError(f"version {version} does not exist (vacuumed?)")
        return self.spark.read.parquet(path)

    def df(self) -> DataFrame:
        return self.snapshot()[1]

    # -- writes --------------------------------------------------------------
    def begin(self) -> "VersionedWrite":
        n, frame = self.snapshot()
        return VersionedWrite(self, n, frame)

    def commit(self, base_version: int, new_df: DataFrame) -> int:
        """Atomically publish ``new_df`` as the next version iff no other
        transaction committed since ``base_version`` was snapshotted."""
        staged = os.path.join(
            self._versions_dir, f".staging-{uuid.uuid4().hex}"
        )
        # materialise OUTSIDE the lock: the expensive distributed write
        # happens concurrently with other writers' work; only the
        # conflict check + two renames serialise
        new_df.write.mode("errorifexists").parquet(staged)
        with table_write_lock(self.root):
            current = self.current_version()
            if current != base_version:
                shutil.rmtree(staged, ignore_errors=True)
                raise WriteConflict(
                    f"base version {base_version} is stale: "
                    f"version {current} committed first"
                )
            nxt = current + 1
            target = self._version_path(nxt)
            # Crash recovery: a writer that died between rename and
            # _set_pointer leaves an orphaned, unreferenced v{n+1} directory
            # that would wedge every later commit (rename onto a non-empty
            # dir fails). The pointer is the sole commit authority, so any
            # directory above it is garbage — clear it under the lock.
            if os.path.isdir(target):
                shutil.rmtree(target)
            os.rename(staged, target)
            self._set_pointer(nxt)
            return nxt

    # -- maintenance ---------------------------------------------------------
    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop version directories older than the newest ``keep``
        (readers still holding pinned snapshots of dropped versions fail
        on next access — the same contract as Delta's VACUUM horizon)."""
        with table_write_lock(self.root):
            versions = sorted(
                int(d[1:])
                for d in os.listdir(self._versions_dir)
                if d.startswith("v") and d[1:].isdigit()
            )
            drop = versions[:-keep] if keep else versions
            current = self.current_version()
            drop = [n for n in drop if n != current]
            for n in drop:
                shutil.rmtree(self._version_path(n), ignore_errors=True)
            return drop


class VersionedWrite:
    """One optimistic transaction: a pinned base snapshot plus the commit
    handle. Mutate by deriving a new DataFrame from ``.frame`` and calling
    ``.commit(new_df)``; on ``WriteConflict`` retry from ``begin()``."""

    def __init__(self, table: VersionedTable, base_version: int, frame: DataFrame):
        self.table = table
        self.base_version = base_version
        self.frame = frame

    def commit(self, new_df: DataFrame) -> int:
        return self.table.commit(self.base_version, new_df)
