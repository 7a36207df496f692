"""Filesystem-backed VersionTracker: one JSON file per commit.

Reference: files/src/main/scala/dev/chronicles/files/FileBackedVersionTracker.scala:30-176
and layout helpers :157-175. Layout under a root directory:

    <root>/_chronicles_table_<schema>.<name>/
        table-metadata                # {"is_snapshot": bool}
        head_ref                      # {"head_ref": "<commit uuid>"}
        table_update_<ms13>.json      # one commit per file; the 13-digit
                                      # zero-padded monotonic-ms filename
                                      # sorts in commit order

Like the reference (FileBackedVersionTracker.scala:23-25) this backend is
last-writer-wins on head_ref — weaker concurrency guarantees than the
sqlite tracker, documented and accepted. The commit-file-per-commit design
is the same shape as a Delta log directory, so the whole log is also
readable distributed via ``spark.read.json(<root>/_chronicles_table_*/table_update_*.json)``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import List

from ..core.clock import MonotonicClock
from ..core.model import TableName
from ..core.ops import TableUpdate, update_from_json, update_to_json
from .base import TableState, UnknownTableError, VersionTracker

_TABLE_DIR_RE = re.compile(r"^_chronicles_table_([\w\-]+)\.([\w\-]+)$")
_UPDATE_FILE_RE = re.compile(r"^table_update_(\d+)\.json$")


class FileBackedVersionTracker(VersionTracker):
    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._clock = MonotonicClock()

    # -- layout -------------------------------------------------------------

    def _table_dir(self, table: TableName) -> Path:
        return self.root / f"_chronicles_table_{table.fully_qualified}"

    # -- primitives ---------------------------------------------------------

    def tables(self) -> List[TableName]:
        out = []
        for p in self.root.iterdir():
            m = _TABLE_DIR_RE.match(p.name)
            if m and p.is_dir():
                out.append(TableName(m.group(1), m.group(2)))
        return sorted(out)

    def _table_exists(self, table: TableName) -> bool:
        return (self._table_dir(table) / "table-metadata").exists()

    def _create_table(self, table: TableName, init_update: TableUpdate, is_snapshot: bool) -> None:
        d = self._table_dir(table)
        d.mkdir(parents=True, exist_ok=True)
        (d / "table-metadata").write_text(json.dumps({"is_snapshot": is_snapshot}))
        self._write_commit_file(d, init_update)
        (d / "head_ref").write_text(json.dumps({"head_ref": init_update.metadata.commit_id}))

    def _write_commit_file(self, d: Path, update: TableUpdate) -> None:
        ts = self._clock.next_timestamp_ms()
        (d / f"table_update_{ts:013d}.json").write_text(update_to_json(update))

    def _append_commit(self, table: TableName, update: TableUpdate) -> None:
        d = self._table_dir(table)
        self._write_commit_file(d, update)
        (d / "head_ref").write_text(json.dumps({"head_ref": update.metadata.commit_id}))

    def _set_head(self, table: TableName, commit_id: str) -> None:
        d = self._table_dir(table)
        (d / "head_ref").write_text(json.dumps({"head_ref": commit_id}))

    def table_state(self, table: TableName) -> TableState:
        d = self._table_dir(table)
        if not (d / "table-metadata").exists():
            raise UnknownTableError(table)
        files = sorted(
            (p for p in d.iterdir() if _UPDATE_FILE_RE.match(p.name)),
            key=lambda p: p.name,
        )
        updates = tuple(update_from_json(p.read_text()) for p in files)
        head = json.loads((d / "head_ref").read_text())["head_ref"]
        return TableState(head, updates)
