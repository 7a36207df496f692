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
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for
from .stats import DISTRIBUTE_THRESHOLD, STATS_FILE

MANIFEST_DIR = "_chronicles_manifest"
MANIFEST_FILE = "manifest"


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


def generate_manifest(
    table: TableDefinition,
    tracker: VersionTracker,
    distributed: bool = False,
    spark=None,
) -> List[str]:
    """(Re)write the manifest tree for the table's CURRENT state; returns
    the manifest file paths written.  ``distributed=True`` fans the
    per-partition listing+write out to executors (pass ``spark``)."""
    if distributed and spark is None:
        raise ValueError("distributed manifest export needs spark=...")
    if distributed and table.location.startswith("memory://"):
        raise ValueError(
            "memory:// storage is process-local test scaffolding; executors "
            "cannot see it — use the driver path (distributed=False)"
        )

    fs, location = filesystem_for(table.location)
    manifest_root = fs.join(location, MANIFEST_DIR)

    live = tracker.current_version(table.name)
    # (relative manifest subpath | None, live version dir)
    jobs: List[Tuple[Optional[str], str]] = []
    if isinstance(live, SnapshotTableVersion):
        if not live.version.is_unversioned or fs.exists(location):
            jobs.append((None, vpaths.path_for(location, live.version)))
    else:
        assert isinstance(live, PartitionedTableVersion)
        for partition, version in sorted(
            live.partition_versions.items(), key=lambda kv: kv[0].path
        ):
            # the manifest subtree mirrors the on-disk (Hive-escaped)
            # partition directory names, not the raw log values
            escaped_rel = partition.resolve_path("")[1:]
            jobs.append(
                (escaped_rel, vpaths.path_for(partition.resolve_path(location), version))
            )

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

    # remember what exists BEFORE writing so stale manifests (partitions no
    # longer live) can be pruned after — never delete before the new tree
    # is complete, or external queries would hit a manifest-less window
    stale = _existing_manifest_rels(fs, manifest_root)
    stale.difference_update(rel or "" for rel, _ in jobs)

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

    for rel in stale:
        if rel:
            fs.remove_tree(fs.join(manifest_root, rel))
        else:
            fs.remove_file(fs.join(manifest_root, MANIFEST_FILE))
    return written
