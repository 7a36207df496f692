"""Filesystem-backed VersionTracker: one JSON file per commit.

Reference: files/src/main/scala/dev/chronicles/files/FileBackedVersionTracker.scala:30-176
and layout helpers :157-175. Layout under a root directory:

    <root>/_chronicles_table_<schema>.<name>/
        table-metadata                # {"is_snapshot": bool}
        head_ref                      # {"head_ref": "<commit uuid>"}
        table_update_<ms13>.json      # one commit per file; the 13-digit
                                      # zero-padded monotonic-ms filename
                                      # sorts in commit order

Storage goes through the :mod:`.fs` facade (≙ PureFileSystem.scala:13-52),
so the commit log can live on local disk (default), in memory
(``memory://`` URLs, tests), or any fsspec scheme (s3://, hdfs://, ...)
where fsspec is installed — a versioned lake at 100 TB keeps its log next
to the data on the object store.

Like the reference (FileBackedVersionTracker.scala:23-25) this backend is
last-writer-wins on head_ref by DEFAULT — weaker concurrency guarantees
than the sqlite tracker, documented and accepted.  ``use_lock=True``
upgrades local-filesystem logs to serialized multi-writer commits: an
exclusive POSIX ``flock`` per table directory brackets each commit (file
write + head_ref advance), and commit filenames are collision-checked
against the directory under the lock, so concurrent writers from separate
OS processes lose nothing (raced in
``tests/test_concurrency_multiprocess.py``).  POSIX advisory locks are
host-local — on NFS or object stores keep the default and use the sqlite
tracker for serialized commits.  The commit-file-per-commit design is the
same shape as a Delta log directory, so the whole log is also readable
distributed via ``spark.read.json(<root>/_chronicles_table_*/table_update_*.json)``.
"""

from __future__ import annotations

import json
import re
from contextlib import contextmanager
from typing import List

from ..core.clock import MonotonicClock
from ..core.model import TableName
from ..core.ops import TableUpdate, update_from_json, update_to_json
from .base import TableState, UnknownTableError, VersionTracker
from .fs import FileSystem, LocalFileSystem, filesystem_for

_TABLE_DIR_RE = re.compile(r"^_chronicles_table_([\w\-]+)\.([\w\-]+)$")
_UPDATE_FILE_RE = re.compile(r"^table_update_(\d+)\.json$")


class FileBackedVersionTracker(VersionTracker):
    def __init__(
        self, root: str, fs: FileSystem | None = None, use_lock: bool = False
    ) -> None:
        if fs is None:
            fs, root = filesystem_for(str(root))
        self.fs = fs
        self.root = str(root)
        self.fs.mkdirs(self.root)
        self._clock = MonotonicClock()
        self._use_lock = bool(use_lock)
        if self._use_lock and not isinstance(self.fs, LocalFileSystem):
            raise ValueError(
                "use_lock needs a local filesystem path (POSIX flock); "
                "for object-store logs use the default last-writer-wins "
                "mode or the sqlite tracker"
            )

    # -- layout -------------------------------------------------------------

    def _table_dir(self, table: TableName) -> str:
        return self.fs.join(self.root, f"_chronicles_table_{table.fully_qualified}")

    # -- primitives ---------------------------------------------------------

    def tables(self) -> List[TableName]:
        out = []
        for name in self.fs.list_dir(self.root):
            m = _TABLE_DIR_RE.match(name)
            if m and self.fs.is_dir(self.fs.join(self.root, name)):
                out.append(TableName(m.group(1), m.group(2)))
        return sorted(out)

    def _table_exists(self, table: TableName) -> bool:
        return self.fs.exists(self.fs.join(self._table_dir(table), "table-metadata"))

    def _create_table(self, table: TableName, init_update: TableUpdate, is_snapshot: bool) -> None:
        d = self._table_dir(table)
        self.fs.mkdirs(d)
        self.fs.write_text(
            self.fs.join(d, "table-metadata"), json.dumps({"is_snapshot": is_snapshot})
        )
        self._write_commit_file(d, init_update)
        self.fs.write_text(
            self.fs.join(d, "head_ref"),
            json.dumps({"head_ref": init_update.metadata.commit_id}),
        )

    @contextmanager
    def _commit_guard(self, d: str):
        """Exclusive per-table-directory flock when ``use_lock`` is on;
        no-op otherwise (default last-writer-wins)."""
        if not self._use_lock:
            yield
            return
        import fcntl

        self.fs.mkdirs(d)
        with open(self.fs.join(d, ".commit_lock"), "a+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(f, fcntl.LOCK_UN)

    def _write_commit_file(self, d: str, update: TableUpdate) -> None:
        ts = self._clock.next_timestamp_ms()
        if self._use_lock:
            # the per-process monotonic clock cannot see OTHER processes'
            # filenames; under the lock a directory check is race-free
            existing = [
                int(m.group(1))
                for n in self.fs.list_dir(d)
                if (m := _UPDATE_FILE_RE.match(n))
            ]
            if existing:
                ts = max(ts, max(existing) + 1)
        self.fs.write_text(
            self.fs.join(d, f"table_update_{ts:013d}.json"), update_to_json(update)
        )

    def _append_commit(self, table: TableName, update: TableUpdate) -> None:
        d = self._table_dir(table)
        with self._commit_guard(d):
            self._write_commit_file(d, update)
            self.fs.write_text(
                self.fs.join(d, "head_ref"),
                json.dumps({"head_ref": update.metadata.commit_id}),
            )

    def _set_head(self, table: TableName, commit_id: str) -> None:
        d = self._table_dir(table)
        self.fs.write_text(self.fs.join(d, "head_ref"), json.dumps({"head_ref": commit_id}))

    def table_state(self, table: TableName) -> TableState:
        d = self._table_dir(table)
        if not self.fs.exists(self.fs.join(d, "table-metadata")):
            raise UnknownTableError(table)
        names = sorted(n for n in self.fs.list_dir(d) if _UPDATE_FILE_RE.match(n))
        updates = tuple(
            update_from_json(self.fs.read_text(self.fs.join(d, n))) for n in names
        )
        head = json.loads(self.fs.read_text(self.fs.join(d, "head_ref")))["head_ref"]
        return TableState(head, updates)
