"""Symlink-format manifest export: query versioned tables from engines
that know nothing about chronicles.

The reference's core value proposition is that versioned data stays plain
Parquet/ORC queryable by any metastore-aware engine (README.md:62-82,
docs/concepts.md:91-94) — via synced partition LOCATION pointers.  This
module covers the engines that can't (or shouldn't) get metastore writes:
like Delta's ``GENERATE symlink_format_manifest``, it materializes the
CURRENT live file set as one plain-text manifest per partition::

    <location>/_chronicles_manifest/<k1=v1/...>/manifest   # one data-file
                                                           # path per line
    <location>/_chronicles_manifest/manifest               # snapshot tables

Presto/Trino/Athena/Hive read such manifests with
``SymlinkTextInputFormat`` external tables; the underscore-prefixed
manifest root is invisible to Spark/Hive directory scans of the data
itself.

Semantics:

* **Full regeneration per call** (Delta's model): every call re-derives
  the whole tree from one consistent fold of the log — but WITHOUT a
  visibility gap: live partitions' manifests are overwritten in place
  (atomic per file), and only the manifests of partitions that are no
  longer live are deleted, afterwards.  An external engine planning a
  query mid-regeneration always finds a complete manifest for every
  still-live partition (old or new content, never absent).  Writers call
  it after commits (or schedule it); a manifest is a point-in-time
  snapshot, not transactionally tied to the log.
* Only DATA files are listed (dotfiles, ``_SUCCESS``-style markers, and
  the ``_chronicles_stats.json`` sidecar are excluded).
* Scale shape: one listing + one small write per live partition; above
  ``DISTRIBUTE_THRESHOLD`` partitions the work fans out to executors over
  the FS facade (the vacuum pattern) so a 100k-partition export never
  crawls from the driver.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..core import paths as vpaths
from ..core.model import (
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..trackers.base import VersionTracker, head_of
from ..trackers.fs import filesystem_for
from .stats import DISTRIBUTE_THRESHOLD, STATS_FILE

MANIFEST_DIR = "_chronicles_manifest"
MANIFEST_FILE = "manifest"
POINTER_FILE = "_last_manifest"


def _data_files(fs, version_dir: str) -> List[str]:
    """Data-file paths inside one ``_version=`` directory (sorted;
    markers/sidecars/dotfiles excluded)."""
    out = []
    for name in fs.list_dir(version_dir):
        if name.startswith((".", "_")) or name == STATS_FILE:
            continue
        p = fs.join(version_dir, name)
        if not fs.is_dir(p):
            out.append(p)
    return sorted(out)


def _read_pointer(fs, manifest_root: str) -> Optional[str]:
    """Commit id the manifest tree currently reflects, or None."""
    import json

    try:
        return json.loads(
            fs.read_text(fs.join(manifest_root, POINTER_FILE))
        )["commit_id"]
    except (FileNotFoundError, KeyError, ValueError):
        return None


def _write_pointer(fs, manifest_root: str, commit_id: str) -> None:
    import json

    fs.mkdirs(manifest_root)
    fs.write_text(
        fs.join(manifest_root, POINTER_FILE), json.dumps({"commit_id": commit_id})
    )


def _existing_manifest_rels(fs, manifest_root: str) -> set:
    """Relative subpaths ("" = table root) that currently hold a manifest
    file — the prune set for partitions that stopped being live."""
    rels: set = set()

    def walk(d: str, rel: str) -> None:
        for name in fs.list_dir(d):
            p = fs.join(d, name)
            if name == MANIFEST_FILE and not fs.is_dir(p):
                rels.add(rel)
            elif fs.is_dir(p):
                walk(p, f"{rel}/{name}" if rel else name)

    if fs.exists(manifest_root):
        walk(manifest_root, "")
    return rels


def _rel_and_dir(location: str, partition, version) -> Tuple[str, str]:
    """(manifest subpath, live version dir) for one partition — the
    manifest subtree mirrors the on-disk (Hive-escaped) directory names,
    not the raw log values."""
    return (
        partition.resolve_path("")[1:],
        vpaths.path_for(partition.resolve_path(location), version),
    )


def generate_manifest(
    table: TableDefinition,
    tracker: VersionTracker,
    distributed: bool = False,
    spark=None,
    incremental: bool = False,
) -> List[str]:
    """(Re)write the manifest tree for the table's CURRENT state; returns
    the manifest file paths written.  ``distributed=True`` fans the
    per-partition listing+write out to executors (pass ``spark``).

    ``incremental=True`` makes repeated runs **O(changed partitions)**: a
    ``_last_manifest`` pointer records the commit the tree reflects, and
    the next run diffs pointer → head (the M12 metadata diff) to rewrite
    only added/overwritten partitions' manifests and delete removed ones —
    the steady-state mode for a scheduled export on a 100k-partition
    table.  Falls back to a full rebuild when no valid pointer exists.
    Crash-safe: the pointer is written only after the manifests, so an
    interrupted run re-covers its window on the next call."""
    if distributed and spark is None:
        raise ValueError("distributed manifest export needs spark=...")
    if distributed and table.location.startswith("memory://"):
        raise ValueError(
            "memory:// storage is process-local test scaffolding; executors "
            "cannot see it — use the driver path (distributed=False)"
        )

    fs, location = filesystem_for(table.location)
    manifest_root = fs.join(location, MANIFEST_DIR)
    head = head_of(tracker, table.name)

    stale_rels: Optional[set] = None  # None = derive by walking (full mode)
    jobs: List[Tuple[Optional[str], str]] = []
    if incremental:
        base_commit = _read_pointer(fs, manifest_root)
        delta = None
        if base_commit is not None and base_commit != head:
            from ..core.diff import (
                AddPartition,
                RemovePartitionOp,
                UpdatePartitionVersion,
                UpdateTableVersion,
            )
            from .reader import changed_partitions

            try:
                delta, _ = changed_partitions(table, tracker, base_commit, head)
            except ValueError:
                delta = None  # pointer from another life: full rebuild
        if base_commit == head:
            return []  # tree already reflects the head
        if delta is not None:
            stale_rels = set()
            for op in delta:
                if isinstance(op, (AddPartition, UpdatePartitionVersion)):
                    jobs.append(_rel_and_dir(location, op.partition, op.version))
                elif isinstance(op, RemovePartitionOp):
                    stale_rels.add(op.partition.resolve_path("")[1:])
                elif isinstance(op, UpdateTableVersion):
                    jobs.append((None, vpaths.path_for(location, op.version)))
            if not jobs and not stale_rels:
                _write_pointer(fs, manifest_root, head)
                return []

    if stale_rels is None:  # full rebuild
        live = tracker.current_version(table.name)
        if isinstance(live, SnapshotTableVersion):
            if not live.version.is_unversioned or fs.exists(location):
                jobs = [(None, vpaths.path_for(location, live.version))]
        else:
            assert isinstance(live, PartitionedTableVersion)
            jobs = [
                _rel_and_dir(location, partition, version)
                for partition, version in sorted(
                    live.partition_versions.items(), key=lambda kv: kv[0].path
                )
            ]
        if not jobs:  # nothing live: the whole tree is stale
            fs.remove_tree(manifest_root)
            return []

    location_url = table.location

    def _write(job_slice) -> List[str]:
        from ..trackers.fs import filesystem_for as _ff

        efs, eloc = _ff(location_url)
        eroot = efs.join(eloc, MANIFEST_DIR)
        written = []
        for rel, vdir in job_slice:
            files = _data_files(efs, vdir)
            target_dir = efs.join(eroot, rel) if rel else eroot
            efs.mkdirs(target_dir)
            target = efs.join(target_dir, MANIFEST_FILE)
            efs.write_text(target, "".join(f + "\n" for f in files))
            written.append(target)
        return written

    # the prune set: in incremental mode exactly the diff's removed
    # partitions; in full mode whatever exists on storage beyond the live
    # set.  Never delete before the new manifests are written, or external
    # queries would hit a manifest-less window.
    if stale_rels is None:
        stale_rels = _existing_manifest_rels(fs, manifest_root)
        stale_rels.difference_update(rel or "" for rel, _ in jobs)

    if not distributed or len(jobs) <= DISTRIBUTE_THRESHOLD:
        written = sorted(_write(jobs))
    else:
        sc = spark.sparkContext
        n_slices = max(1, min(len(jobs), sc.defaultParallelism))
        written = sorted(
            sc.parallelize(jobs, n_slices)
            .mapPartitions(lambda it: _write(list(it)))
            .collect()
        )

    for rel in stale_rels:
        if rel:
            fs.remove_tree(fs.join(manifest_root, rel))
        else:
            fs.remove_file(fs.join(manifest_root, MANIFEST_FILE))
    _write_pointer(fs, manifest_root, head)
    return written
