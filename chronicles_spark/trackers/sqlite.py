"""Sqlite-backed VersionTracker — the serializable option.

Reference: db/src/main/scala/dev/chronicles/db/DbVersionTracker.scala
(schema S1-S4 :140-190, queries :192-279, op (de)serialization :281-328,
SERIALIZABLE isolation rationale :19-23,:118-124). Same four-table shape:

    chronicle_tables_v1          — tables registry
    chronicle_table_updates_v1   — commits, identity sequence_id = total order
    chronicle_table_operations_v1— ops, PK (commit_id, index_in_commit)
    chronicles_version_refs_v1   — head pointer per table

Sqlite transactions are serializable by default; every multi-statement
commit runs in one transaction.
"""

from __future__ import annotations

import sqlite3
import threading
from datetime import datetime
from typing import List

from ..core.model import Partition, TableName
from ..core.ops import (
    AddPartitionVersion,
    AddTableVersion,
    InitTable,
    RemovePartition,
    TableOperation,
    TableUpdate,
    TableUpdateMetadata,
)
from ..core.version import Version
from .base import TableState, UnknownTableError, VersionTracker

# db string tags (DbVersionTracker.scala:288-292)
_TAG = {
    InitTable: "init_table",
    AddTableVersion: "add_table_version",
    AddPartitionVersion: "add_part_version",
    RemovePartition: "remove_part",
}

_SCHEMA = """
CREATE TABLE IF NOT EXISTS chronicle_tables_v1 (
  table_name TEXT PRIMARY KEY,
  creation_time TEXT NOT NULL
);
CREATE TABLE IF NOT EXISTS chronicle_table_updates_v1 (
  sequence_id INTEGER PRIMARY KEY AUTOINCREMENT,
  commit_id TEXT UNIQUE NOT NULL,
  table_name TEXT NOT NULL REFERENCES chronicle_tables_v1(table_name),
  update_time TEXT NOT NULL,
  user_id TEXT NOT NULL,
  message TEXT NOT NULL
);
CREATE TABLE IF NOT EXISTS chronicle_table_operations_v1 (
  commit_id TEXT NOT NULL REFERENCES chronicle_table_updates_v1(commit_id),
  index_in_commit INTEGER NOT NULL,
  operation_type TEXT NOT NULL,
  version TEXT,
  partition TEXT,
  is_snapshot_table INTEGER,
  PRIMARY KEY (commit_id, index_in_commit)
);
CREATE TABLE IF NOT EXISTS chronicles_version_refs_v1 (
  table_name TEXT PRIMARY KEY REFERENCES chronicle_tables_v1(table_name),
  current_version TEXT NOT NULL REFERENCES chronicle_table_updates_v1(commit_id)
);
CREATE TABLE IF NOT EXISTS chronicles_tags_v1 (
  table_name TEXT NOT NULL REFERENCES chronicle_tables_v1(table_name),
  tag_name TEXT NOT NULL,
  commit_id TEXT NOT NULL REFERENCES chronicle_table_updates_v1(commit_id),
  PRIMARY KEY (table_name, tag_name)
);
"""


def _op_row(op: TableOperation, idx: int, commit_id: str):
    if isinstance(op, InitTable):
        return (commit_id, idx, _TAG[InitTable], None, None, 1 if op.is_snapshot else 0)
    if isinstance(op, AddTableVersion):
        return (commit_id, idx, _TAG[AddTableVersion], op.version.label, None, None)
    if isinstance(op, AddPartitionVersion):
        return (commit_id, idx, _TAG[AddPartitionVersion], op.version.label, op.partition.path, None)
    if isinstance(op, RemovePartition):
        return (commit_id, idx, _TAG[RemovePartition], None, op.partition.path, None)
    raise TypeError(f"unknown op {op!r}")


def _row_op(operation_type, version, partition, is_snapshot, table_name) -> TableOperation:
    """Typed op from a row (DbVersionTracker.scala:281-293)."""
    if operation_type == "init_table":
        return InitTable(table_name, bool(is_snapshot))
    if operation_type == "add_table_version":
        return AddTableVersion(Version(version))
    if operation_type == "add_part_version":
        return AddPartitionVersion(Partition.parse(partition), Version(version))
    if operation_type == "remove_part":
        return RemovePartition(Partition.parse(partition))
    raise ValueError(f"unknown operation_type {operation_type!r}")


class SqliteVersionTracker(VersionTracker):
    def __init__(self, path: str = ":memory:") -> None:
        self._conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.RLock()
        with self._lock, self._conn:
            self._conn.executescript(_SCHEMA)

    def tables(self) -> List[TableName]:
        with self._lock:
            rows = self._conn.execute(
                "SELECT table_name FROM chronicle_tables_v1 ORDER BY table_name"
            ).fetchall()
        return [TableName.parse(r[0]) for r in rows]

    def _table_exists(self, table: TableName) -> bool:
        with self._lock:
            row = self._conn.execute(
                "SELECT 1 FROM chronicle_tables_v1 WHERE table_name = ?",
                (table.fully_qualified,),
            ).fetchone()
        return row is not None

    def _create_table(self, table: TableName, init_update: TableUpdate, is_snapshot: bool) -> None:
        m = init_update.metadata
        with self._lock, self._conn:  # one txn: 4 inserts (DbVersionTracker.scala:41-65)
            self._conn.execute(
                "INSERT INTO chronicle_tables_v1 VALUES (?, ?)",
                (table.fully_qualified, m.timestamp.isoformat()),
            )
            self._insert_update(table, init_update)
            self._conn.execute(
                "INSERT INTO chronicles_version_refs_v1 VALUES (?, ?)",
                (table.fully_qualified, m.commit_id),
            )

    def _drop_table(self, table: TableName) -> None:
        fq = table.fully_qualified
        with self._lock, self._conn:  # one txn, FK-safe order
            self._conn.execute(
                "DELETE FROM chronicles_version_refs_v1 WHERE table_name = ?", (fq,)
            )
            self._conn.execute(
                "DELETE FROM chronicles_tags_v1 WHERE table_name = ?", (fq,)
            )
            self._conn.execute(
                "DELETE FROM chronicle_table_operations_v1 WHERE commit_id IN "
                "(SELECT commit_id FROM chronicle_table_updates_v1 WHERE table_name = ?)",
                (fq,),
            )
            self._conn.execute(
                "DELETE FROM chronicle_table_updates_v1 WHERE table_name = ?", (fq,)
            )
            self._conn.execute(
                "DELETE FROM chronicle_tables_v1 WHERE table_name = ?", (fq,)
            )

    def _insert_update(self, table: TableName, update: TableUpdate) -> None:
        m = update.metadata
        self._conn.execute(
            "INSERT INTO chronicle_table_updates_v1 "
            "(commit_id, table_name, update_time, user_id, message) VALUES (?,?,?,?,?)",
            (m.commit_id, table.fully_qualified, m.timestamp.isoformat(), m.user_id, m.message),
        )
        self._conn.executemany(
            "INSERT INTO chronicle_table_operations_v1 VALUES (?,?,?,?,?,?)",
            [_op_row(op, i, m.commit_id) for i, op in enumerate(update.operations)],
        )

    def _serialized_commit(self, table: TableName):
        # connection RLock: optimistic check-then-append is atomic for every
        # writer sharing this tracker/connection; cross-process writers on
        # one sqlite FILE still serialize their individual transactions but
        # keep the documented best-effort check window
        return self._lock

    def _append_commit(self, table: TableName, update: TableUpdate) -> None:
        with self._lock, self._conn:
            self._insert_update(table, update)
            self._conn.execute(
                "UPDATE chronicles_version_refs_v1 SET current_version = ? WHERE table_name = ?",
                (update.metadata.commit_id, table.fully_qualified),
            )

    def _set_head(self, table: TableName, commit_id: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "UPDATE chronicles_version_refs_v1 SET current_version = ? WHERE table_name = ?",
                (commit_id, table.fully_qualified),
            )

    def commit_group(self, updates) -> None:
        """Cross-table group commit as ONE SERIALIZABLE transaction —
        every table's log row, op rows, and head pointer land atomically;
        a failure (or crash) rolls the whole group back (S8 isolation
        stance, DbVersionTracker.scala:118-124, extended across tables)."""
        from .base import UnknownTableError

        with self._lock, self._conn:
            for table in sorted(updates, key=lambda t: t.fully_qualified):
                row = self._conn.execute(
                    "SELECT 1 FROM chronicle_tables_v1 WHERE table_name = ?",
                    (table.fully_qualified,),
                ).fetchone()
                if row is None:
                    raise UnknownTableError(table)
                update = updates[table]
                self._insert_update(table, update)
                self._conn.execute(
                    "UPDATE chronicles_version_refs_v1 SET current_version = ? "
                    "WHERE table_name = ?",
                    (update.metadata.commit_id, table.fully_qualified),
                )

    def _write_tag(self, table: TableName, name: str, commit_id: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT INTO chronicles_tags_v1 VALUES (?, ?, ?) "
                "ON CONFLICT(table_name, tag_name) DO UPDATE SET commit_id = excluded.commit_id",
                (table.fully_qualified, name, commit_id),
            )

    def _read_tags(self, table: TableName) -> dict:
        with self._lock:
            rows = self._conn.execute(
                "SELECT tag_name, commit_id FROM chronicles_tags_v1 WHERE table_name = ?",
                (table.fully_qualified,),
            ).fetchall()
        return dict(rows)

    def _delete_tag(self, table: TableName, name: str) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "DELETE FROM chronicles_tags_v1 WHERE table_name = ? AND tag_name = ?",
                (table.fully_qualified, name),
            )

    # S5 join shape (DbVersionTracker.scala:239-256) with the ops side
    # LEFT-joined so zero-operation commits (e.g. versioned insert of an
    # empty DataFrame) survive as empty-ops updates, matching the
    # memory/files backends.
    _UPDATES_SQL = """
        SELECT u.commit_id, u.update_time, u.user_id, u.message,
               o.index_in_commit, o.operation_type, o.version, o.partition,
               o.is_snapshot_table
        FROM chronicle_tables_v1 t
        JOIN chronicle_table_updates_v1 u ON u.table_name = t.table_name
        LEFT JOIN chronicle_table_operations_v1 o ON o.commit_id = u.commit_id
        WHERE t.table_name = ? {extra}
        ORDER BY u.sequence_id ASC, o.index_in_commit ASC
        """

    @staticmethod
    def _assemble(rows, name: str) -> tuple:
        """Commits from adjacent joined rows (DbVersionTracker.scala:67-84)."""
        updates: List[TableUpdate] = []
        cur_id = None
        cur_meta = None
        cur_ops: List[TableOperation] = []
        for commit_id, update_time, user_id, message, _idx, op_t, ver, part, snap in rows:
            if commit_id != cur_id:
                if cur_meta is not None:
                    updates.append(TableUpdate(cur_meta, tuple(cur_ops)))
                cur_id = commit_id
                cur_meta = TableUpdateMetadata(
                    commit_id, user_id, message, datetime.fromisoformat(update_time)
                )
                cur_ops = []
            if op_t is not None:  # NULL from LEFT JOIN = zero-op commit
                cur_ops.append(_row_op(op_t, ver, part, snap, name))
        if cur_meta is not None:
            updates.append(TableUpdate(cur_meta, tuple(cur_ops)))
        return tuple(updates)

    def table_state(self, table: TableName) -> TableState:
        name = table.fully_qualified
        with self._lock:
            if not self._table_exists(table):
                raise UnknownTableError(table)
            head = self._conn.execute(
                "SELECT current_version FROM chronicles_version_refs_v1 WHERE table_name = ?",
                (name,),
            ).fetchone()[0]
            rows = self._conn.execute(
                self._UPDATES_SQL.format(extra=""), (name,)
            ).fetchall()
        return TableState(head, self._assemble(rows, name))

    # -- tail access (streaming-source support; files.py:206-210 contract) --
    # ``sequence_id`` is AUTOINCREMENT: per-table sequences are strictly
    # monotonic and never reused, and inserts are transaction-serialized, so
    # — unlike the unlocked files tracker — a commit can never appear inside
    # an already-consumed prefix here.

    def head_commit_id(self, table: TableName) -> str:
        """The current head commit id — one indexed point read, no log scan."""
        with self._lock:
            if not self._table_exists(table):
                raise UnknownTableError(table)
            return self._conn.execute(
                "SELECT current_version FROM chronicles_version_refs_v1 "
                "WHERE table_name = ?",
                (table.fully_qualified,),
            ).fetchone()[0]

    def update_seqs(self, table: TableName) -> List[int]:
        """Commit sequence ids, ascending — an indexed id scan, no op rows."""
        with self._lock:
            if not self._table_exists(table):
                raise UnknownTableError(table)
            rows = self._conn.execute(
                "SELECT sequence_id FROM chronicle_table_updates_v1 "
                "WHERE table_name = ? ORDER BY sequence_id ASC",
                (table.fully_qualified,),
            ).fetchall()
        return [r[0] for r in rows]

    def update_count(self, table: TableName) -> int:
        """Number of commits — one COUNT(*), no rows materialized."""
        with self._lock:
            if not self._table_exists(table):
                raise UnknownTableError(table)
            return self._conn.execute(
                "SELECT COUNT(*) FROM chronicle_table_updates_v1 WHERE table_name = ?",
                (table.fully_qualified,),
            ).fetchone()[0]

    def updates_slice(self, table: TableName, start: int, end: int) -> tuple:
        """Updates at log positions [start, end) in commit order."""
        seqs = self.update_seqs(table)[start:end]
        if not seqs:
            return ()
        return self.updates_in_seq_range(table, seqs[0] - 1, seqs[-1])

    def updates_in_seq_range(self, table: TableName, lo: int, hi: int) -> tuple:
        """Updates with ``lo < sequence_id <= hi``, in commit order — reads
        only those commits' rows."""
        name = table.fully_qualified
        with self._lock:
            if not self._table_exists(table):
                raise UnknownTableError(table)
            rows = self._conn.execute(
                self._UPDATES_SQL.format(
                    extra="AND u.sequence_id > ? AND u.sequence_id <= ?"
                ),
                (name, lo, hi),
            ).fetchall()
        return self._assemble(rows, name)
