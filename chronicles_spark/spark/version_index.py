"""Persistent Add-ops index: O(tail) enumeration of every version ever
written, for the SWEEP operators (:func:`~chronicles_spark.spark.vacuum.
vacuum`, :func:`~chronicles_spark.operators.ann_index.
vacuum_ann_artifacts`).

The fold checkpoints (trackers/files.py) make HEAD reads O(tail), but a
sweep needs the full ``(partition, version)`` history of every line —
main plus branches — to decide which directories are superseded.
Without an index that is one file read + JSON parse PER COMMIT per
sweep: fine at 10⁴ commits, a stall at 10⁶.  This module extends the
checkpoint idea to that enumeration: the sweep persists the cumulative
Add-ops list per line as ONE JSON file next to the data
(``_chronicles_versions_index.json``), and the next sweep reads the
index plus only the commits appended since (``updates_slice`` — the
same O(new commits) tail surface the CDC stream source uses).

Safety rules (the commit files stay the only source of truth):

* the index stores, per line, the POSITION folded up to and the first
  commit's id; a shrunken log, a mismatched first commit (drop +
  recreate under the same name), a missing/corrupt file, or a tracker
  without the tail surface all degrade to the full walk — never an
  error, never a stale answer;
* lines are re-enumerated from the tracker at every sweep: a DROPPED
  branch's entries are discarded with it (identical semantics to the
  full walk, which cannot see a dropped log either), so the index can
  never hold a deletion candidate the walk would not produce;
* ops are append-only in every backend (rollback moves the head
  pointer, never removes commits), so a cumulative prefix never needs
  invalidation by content — only by identity (the first-commit check).

Artifact size: the index holds one (path, label) pair per Add op ever
committed — ~100 bytes each, so ~100 MB of JSON at 10⁶ single-partition
commits, parsed once per sweep (seconds).  That replaces 10⁶ individual
commit-file reads (hours of GETs on an object store); if the parse
itself ever becomes the bottleneck the format can move to parquet
without touching the guards.  Vacuum does not shrink the index (GC
removes data directories, not commits); a log whose history is
truncated out-of-band fails the identity check and rebuilds.

Like the reference's stance that reads resolve through recorded
metadata, not storage walks (spark/src/main/scala/dev/chronicles/spark/
SparkHiveMetastore.scala:58-61), the sweep's candidate enumeration here
resolves through one recorded artifact plus the log tail.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from ..core.model import Partition, TableDefinition
from ..core.ops import AddPartitionVersion, AddTableVersion
from ..core.version import Version
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for

INDEX_FILE = "_chronicles_versions_index.json"


def _entries_of(updates) -> List[Tuple[Optional[str], str]]:
    """JSON-serializable (partition_path | None, label) for every Add op,
    in commit order — the exact stream vacuum's ``_line_versions``
    yields, flattened to strings."""
    out: List[Tuple[Optional[str], str]] = []
    for update in updates:
        for op in update.operations:
            if isinstance(op, AddPartitionVersion):
                out.append((op.partition.path, op.version.label))
            elif isinstance(op, AddTableVersion):
                out.append((None, op.version.label))
    return out


def _revive(entries) -> List[Tuple[Optional[Partition], Version]]:
    return [
        (Partition.parse(p) if p is not None else None, Version(label))
        for p, label in entries
    ]


def _index_path(table: TableDefinition):
    fs, root = filesystem_for(table.location)
    return fs, fs.join(root, INDEX_FILE)


def _load_index(table: TableDefinition) -> dict:
    fs, path = _index_path(table)
    if not fs.exists(path):
        return {}
    try:
        doc = json.loads(fs.read_text(path))
        lines = doc.get("lines", {})
        return lines if isinstance(lines, dict) else {}
    except (ValueError, KeyError, OSError):
        return {}  # corrupt index degrades to the full walk


def _save_index(table: TableDefinition, lines: dict) -> None:
    fs, path = _index_path(table)
    fs.mkdirs(path.rsplit("/", 1)[0])  # metadata-only logs: no data dir yet
    fs.write_text(path, json.dumps({"lines": lines}))


def line_versions_indexed(
    tracker: VersionTracker,
    table: TableDefinition,
    line_names,
    use_index: bool = True,
) -> "dict[str, list]":
    """``{line_name: [(Partition | None, Version), ...]}`` in commit order
    for every given line, via the persisted index + log tail when
    possible, via the full walk otherwise.  Persists the refreshed index
    (only the given lines — dropped lines fall out) before returning.

    Trackers without the tail surface (``update_count`` /
    ``updates_slice``) take the full walk and the index is not written —
    correctness never depends on the fast path existing."""
    count_of = getattr(tracker, "update_count", None)
    slice_of = getattr(tracker, "updates_slice", None)
    if not use_index or count_of is None or slice_of is None:
        return {
            name: _revive(_entries_of(tracker.table_state(name).updates))
            for name in line_names
        }
    stored = _load_index(table)
    fresh: dict = {}
    out: dict = {}
    for name in line_names:
        key = str(name)
        n = count_of(name)
        first_id = (
            slice_of(name, 0, 1)[0].metadata.commit_id if n else None
        )
        rec = stored.get(key)
        usable = (
            rec
            and rec.get("first_commit_id") == first_id
            and isinstance(rec.get("upto"), int)
            and 0 < rec["upto"] <= n
        )
        if usable:
            # position-shift guard (the checkpoint covers-prefix lesson):
            # a CAS writer whose clock ran behind can land a commit file
            # BELOW an already-indexed position, shifting every position
            # after it — detectable because the commit id at position
            # upto-1 no longer matches what the index folded there
            tail = slice_of(name, rec["upto"] - 1, n)
            usable = bool(tail) and (
                tail[0].metadata.commit_id == rec.get("last_commit_id")
            )
        if usable:
            entries = [tuple(e) for e in rec["entries"]]
            entries += _entries_of(tail[1:])
        else:
            # unknown line, shrunken/recreated/shifted log, or corrupt
            # record — rebuild this line from scratch
            entries = _entries_of(tracker.table_state(name).updates)
        last_id = (
            slice_of(name, n - 1, n)[0].metadata.commit_id if n else None
        )
        fresh[key] = {
            "upto": n,
            "first_commit_id": first_id,
            "last_commit_id": last_id,
            "entries": [list(e) for e in entries],
        }
        out[name] = _revive(entries)
    try:
        _save_index(table, fresh)
    except OSError:
        pass  # read-only storage: the sweep still ran, just un-cached
    return out
