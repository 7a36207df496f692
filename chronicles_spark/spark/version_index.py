"""Persistent Add-ops index: O(tail) enumeration of every version ever
written, for the SWEEP operators (:func:`~chronicles_spark.spark.vacuum.
vacuum`, :func:`~chronicles_spark.operators.ann_index.
vacuum_ann_artifacts`).

The fold checkpoints (trackers/files.py) make HEAD reads O(tail), but a
sweep needs the full ``(partition, version)`` history of every line —
main plus branches — to decide which directories are superseded.
Without an index that is one file read + JSON parse PER COMMIT per
sweep: fine at 10⁴ commits, a stall at 10⁶.  This module extends the
checkpoint idea to that enumeration, and (round 8) keeps the ARTIFACT
itself O(tail) per sweep too: entries live in immutable SEGMENT files
under ``_chronicles_versions_index/`` and a small ``manifest.json``
records, per line, the identity guards plus the ordered segment list.
A sweep that finds N new commits writes ONE new segment holding exactly
those N entries and rewrites only the manifest — never the history.
(The previous layout was one cumulative JSON blob re-written whole per
sweep: at 10⁶ commits that is a ~100 MB PUT per sweep for a 1-commit
tail.)  When a line accumulates more than ``MAX_SEGMENTS_PER_LINE``
segments they are compacted into one — amortized O(total/64), bounding
both the per-sweep GET count and the long-run write cost.

Safety rules (the commit files stay the only source of truth):

* the manifest stores, per line, the POSITION folded up to, the first
  commit's id, and the commit id AT the last indexed position; a
  shrunken log, a mismatched first commit (drop + recreate under the
  same name), a position shift (a CAS gap-filler landing below an
  indexed position), a missing/corrupt manifest OR segment file, or a
  tracker without the tail surface all degrade to the full walk —
  never an error, never a stale answer;
* lines are re-enumerated from the tracker at every sweep: a DROPPED
  branch's entries are discarded with it (identical semantics to the
  full walk, which cannot see a dropped log either), so the index can
  never hold a deletion candidate the walk would not produce;
* ops are append-only in every backend (rollback moves the head
  pointer, never removes commits), so a cumulative prefix never needs
  invalidation by content — only by identity (the first-commit check);
* segment files are immutable and written BEFORE the manifest that
  references them: a crash leaves unreferenced orphans (reclaimed by
  the next sweep's cleanup pass), never a manifest pointing at missing
  data; the cleanup pass SKIPS unreferenced segments younger than
  ``ORPHAN_SEGMENT_GRACE_SECONDS`` — two sweeps racing on one table
  must not delete each other's just-written segments between segment
  write and manifest write (the loser's segments would merely degrade
  it to a full-walk rebuild, but sustained concurrent sweeps would
  thrash the index and repeatedly pay the rebuild write);
* the pre-segmentation single-blob file is still READ (migration);
  the first sweep under this layout rewrites it as segments and
  removes the blob.

Like the reference's stance that reads resolve through recorded
metadata, not storage walks (spark/src/main/scala/dev/chronicles/spark/
SparkHiveMetastore.scala:58-61), the sweep's candidate enumeration here
resolves through one recorded manifest plus the log tail.
"""

from __future__ import annotations

import json
import uuid
from typing import List, Optional, Tuple

from ..core.model import Partition, TableDefinition
from ..core.ops import AddPartitionVersion, AddTableVersion
from ..core.version import Version
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for

INDEX_FILE = "_chronicles_versions_index.json"  # legacy single blob (read-only)
INDEX_DIR = "_chronicles_versions_index"
MANIFEST_FILE = "manifest.json"
MAX_SEGMENTS_PER_LINE = 64
# unreferenced segments younger than this are left alone by the reclaim
# pass: they may be a CONCURRENT sweep's segments, written but not yet
# referenced by its manifest (a sweep takes seconds; 15 min is orders of
# magnitude of safety).  Genuinely crashed sweeps' orphans age out.
ORPHAN_SEGMENT_GRACE_SECONDS = 900.0


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


def index_dir_path(table: TableDefinition):
    fs, root = filesystem_for(table.location)
    return fs, fs.join(root, INDEX_DIR)


def manifest_path(table: TableDefinition) -> str:
    fs, d = index_dir_path(table)
    return fs.join(d, MANIFEST_FILE)


def _load_manifest(table: TableDefinition) -> dict:
    """Per-line manifest records (no entries — those live in segments),
    or the LEGACY single-blob records (entries inline, marked with
    ``"_legacy_entries"``), or {} when absent/corrupt."""
    fs, d = index_dir_path(table)
    mpath = fs.join(d, MANIFEST_FILE)
    try:
        if fs.exists(mpath):
            doc = json.loads(fs.read_text(mpath))
            lines = doc.get("lines", {})
            return lines if isinstance(lines, dict) else {}
    except (ValueError, KeyError, OSError):
        return {}  # corrupt manifest degrades to the full walk
    # migration: the pre-segmentation cumulative blob
    legacy = fs.join(fs.join(*mpath.rsplit("/", 2)[:1]), INDEX_FILE)
    try:
        if fs.exists(legacy):
            doc = json.loads(fs.read_text(legacy))
            lines = doc.get("lines", {})
            if isinstance(lines, dict):
                for rec in lines.values():
                    if isinstance(rec, dict) and "entries" in rec:
                        rec["_legacy_entries"] = rec.pop("entries")
                return lines
    except (ValueError, KeyError, OSError):
        pass
    return {}


def _read_segments(fs, d, rec) -> "list | None":
    """All of a record's entries, concatenated from its segment files (or
    the legacy inline list).  None = any segment missing/corrupt — the
    caller rebuilds the line."""
    if "_legacy_entries" in rec:
        return [tuple(e) for e in rec["_legacy_entries"]]
    entries: list = []
    for seg in rec.get("segments", ()):
        try:
            doc = json.loads(fs.read_text(fs.join(d, seg["file"])))
            entries.extend(tuple(e) for e in doc["entries"])
        except (ValueError, KeyError, OSError, FileNotFoundError):
            return None
    return entries


def _write_segment(fs, d, entries) -> dict:
    """One immutable segment file; returns its manifest stanza."""
    name = f"seg-{uuid.uuid4().hex}.json"
    fs.write_text(fs.join(d, name), json.dumps({"entries": [list(e) for e in entries]}))
    return {"file": name, "n": len(entries)}


def line_versions_indexed(
    tracker: VersionTracker,
    table: TableDefinition,
    line_names,
    use_index: bool = True,
) -> "dict[str, list]":
    """``{line_name: [(Partition | None, Version), ...]}`` in commit order
    for every given line, via the persisted index + log tail when
    possible, via the full walk otherwise.  Persists the refreshed index
    (only the given lines — dropped lines fall out) before returning,
    writing ONLY the tail as a new segment for lines whose prefix was
    reusable.

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
    fs, d = index_dir_path(table)
    stored = _load_manifest(table)
    out: dict = {}
    plans: list = []

    # ---- phase 1: resolve every line's entries (reads only) --------------
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
        tail = ()
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
        prefix = _read_segments(fs, d, rec) if usable else None
        if prefix is not None:
            tail_entries = _entries_of(tail[1:])
            entries = prefix + tail_entries
            reuse = (
                []
                if "_legacy_entries" in rec  # migrate the blob once
                else [dict(s) for s in rec.get("segments", ())]
            )
            legacy_prefix = prefix if "_legacy_entries" in rec else None
        else:
            # unknown line, shrunken/recreated/shifted log, corrupt or
            # missing segment — rebuild this line from scratch
            entries = _entries_of(tracker.table_state(name).updates)
            tail_entries = None  # sentinel: full rebuild
            reuse = []
            legacy_prefix = None
        last_id = (
            slice_of(name, n - 1, n)[0].metadata.commit_id if n else None
        )
        plans.append(
            (key, n, first_id, last_id, entries, tail_entries, reuse,
             legacy_prefix)
        )
        out[name] = _revive(entries)

    # ---- phase 2: persist (tail segments + manifest + reclaim) -----------
    # Any failure here (read-only storage) leaves the sweep's ANSWER
    # intact — just un-cached; partially written segments become orphans
    # the next successful sweep reclaims.
    try:
        fs.mkdirs(d)
        fresh: dict = {}
        keep_files: set = set()
        for (key, n, first_id, last_id, entries, tail_entries, reuse,
             legacy_prefix) in plans:
            if tail_entries is None:
                # full rebuild: one segment with the whole history
                segments = [_write_segment(fs, d, entries)] if entries else []
            else:
                segments = list(reuse)
                if legacy_prefix:
                    segments.append(_write_segment(fs, d, legacy_prefix))
                if tail_entries:
                    segments.append(_write_segment(fs, d, tail_entries))
            if len(segments) > MAX_SEGMENTS_PER_LINE:
                # compaction: one merged segment — amortized O(total/64),
                # bounds the per-sweep GET count and long-run write cost
                segments = [_write_segment(fs, d, entries)]
            fresh[key] = {
                "upto": n,
                "first_commit_id": first_id,
                "last_commit_id": last_id,
                "segments": segments,
            }
            keep_files.update(s["file"] for s in segments)
        fs.write_text(
            fs.join(d, MANIFEST_FILE), json.dumps({"lines": fresh})
        )
        # reclaim: superseded/orphaned segments (rebuilds, compactions,
        # crashes between segment write and manifest write) and the
        # migrated legacy blob.  RECENT unreferenced segments are left
        # alone — they may belong to a concurrent sweep that has not
        # written its manifest yet (mtime unknown → treat as recent)
        import time as _time

        now = _time.time()
        for nme in fs.list_dir(d):
            if (
                nme.startswith("seg-")
                and nme.endswith(".json")
                and nme not in keep_files
            ):
                p = fs.join(d, nme)
                mt = fs.mtime(p)
                if mt is None or now - mt < ORPHAN_SEGMENT_GRACE_SECONDS:
                    continue
                fs.remove_file(p)
        legacy = fs.join(fs.join(*d.rsplit("/", 1)[:1]), INDEX_FILE)
        if fs.exists(legacy):
            fs.remove_file(legacy)
    except OSError:
        pass  # read-only storage: the sweep still ran, just un-cached
    return out
