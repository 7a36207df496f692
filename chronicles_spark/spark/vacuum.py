"""Version GC (vacuum): delete superseded ``_version=`` directories.

The reference leaves purging old versions to the user (README.md:51-52);
this is the missing maintenance operator, with Delta-VACUUM-like safety
rules:

* the CURRENTLY LIVE version of every partition (fold at head) is always
  kept — vacuum after a rollback never deletes what the head points at;
* the newest ``keep_last`` versions per partition are kept (time-travel
  window); older unreferenced directories are removed;
* ``dry_run`` lists without deleting.

Scale note: the decision set is log-metadata-sized (one row per
(partition, version) ever written — millions of rows is a tiny DataFrame),
NOT data-sized.  Deletion goes through the same FS facade the commit log
uses; on an object store each delete is a prefix delete.  The default path
probes and deletes from the driver (right for up-to-thousands of doomed
prefixes); ``distributed=True`` fans the candidate list out to executors
(``mapPartitions`` over the path list, one FS client per task) so a vacuum
after heavy churn — 10⁵-10⁶ doomed prefixes — issues its existence probes
and deletes cluster-wide instead of serially from one node.  Both paths
make identical decisions from the same log metadata.
"""

from __future__ import annotations

from typing import List

from ..core import paths as vpaths
from ..core.model import (
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..core.ops import AddPartitionVersion, AddTableVersion
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for


def _versions_ever_written(tracker: VersionTracker, table: TableDefinition):
    """(partition | None, version) for every Add op in the full log, in
    commit order (oldest first)."""
    state = tracker.table_state(table.name)
    out: list[tuple[object, object]] = []
    for update in state.updates:
        for op in update.operations:
            if isinstance(op, AddPartitionVersion):
                out.append((op.partition, op.version))
            elif isinstance(op, AddTableVersion):
                out.append((None, op.version))
    return out


def vacuum(
    table: TableDefinition,
    tracker: VersionTracker,
    keep_last: int = 1,
    dry_run: bool = False,
    distributed: bool = False,
    spark=None,
) -> List[str]:
    """Delete superseded version directories; returns the removed (or, in
    dry-run, doomed) paths.

    ``distributed=True`` issues the existence probes and deletes from
    executors (pass ``spark``); the doomed set is identical to the driver
    path — only WHERE the FS calls run changes."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if distributed and spark is None:
        raise ValueError("distributed vacuum needs the SparkSession (spark=...)")
    if distributed and table.location.startswith("memory://"):
        raise ValueError(
            "memory:// storage is process-local test scaffolding; executors "
            "cannot see it — use the driver path (distributed=False)"
        )

    live = tracker.current_version(table.name)
    keep: set[tuple[str, str]] = set()
    if isinstance(live, SnapshotTableVersion):
        keep.add(("", live.version.label))
    elif isinstance(live, PartitionedTableVersion):
        for partition, version in live.partition_versions.items():
            keep.add((partition.path, version.label))

    by_part: dict[object, list] = {}
    part_objs: dict[object, object] = {}
    for partition, version in _versions_ever_written(tracker, table):
        key = partition.path if partition is not None else ""
        by_part.setdefault(key, []).append(version)
        part_objs[key] = partition
    for key, versions in by_part.items():
        for v in versions[-keep_last:]:
            keep.add((key, v.label))

    # deletion goes through the FS facade, so a table whose data lives on
    # an object store (s3://, memory://, any fsspec scheme) vacuums the
    # same way a local one does
    fs, location = filesystem_for(table.location)

    # candidate list from log metadata only — no FS calls yet
    candidates: List[str] = []
    for key, versions in by_part.items():
        partition = part_objs[key]
        # resolve_path applies the same Hive-style escaping the writer uses
        base = (
            partition.resolve_path(location)
            if partition is not None
            else location
        )
        for v in versions:
            if (key, v.label) in keep:
                continue
            if v.is_unversioned:
                # the adopt-in-place sentinel maps to the BARE partition/table
                # path (VersionPaths.scala:19-20) — deleting it would take the
                # whole table (nested _version dirs included) with it
                continue
            candidates.append(vpaths.path_for(base, v))
    candidates = sorted(set(candidates))
    if not candidates:
        return []

    if distributed:
        location_url = table.location
        do_delete = not dry_run

        # Reporting caveat (deletion itself is idempotent and safe): if a
        # task is retried after deleting part of its slice, the retry
        # re-probes those prefixes as already-gone and omits them, so the
        # RETURNED list can under-report what was actually removed.  Exact
        # accounting would need a probe-only pass first (twice the FS
        # round-trips) — not worth it for a GC report; treat the return
        # value as "at least these were reclaimed".

        def _probe_and_delete(paths_iter):
            # executor-side: fresh FS client per task, same facade
            from chronicles_spark.trackers.fs import filesystem_for as _ff

            efs, _ = _ff(location_url)
            for p in paths_iter:
                if efs.exists(p):
                    if do_delete:
                        efs.remove_tree(p)
                    yield p

        sc = spark.sparkContext
        n_slices = max(1, min(len(candidates), sc.defaultParallelism))
        doomed = (
            sc.parallelize(candidates, n_slices)
            .mapPartitions(_probe_and_delete)
            .collect()
        )
        return sorted(set(doomed))

    doomed = []
    for vdir in candidates:
        if fs.exists(vdir):
            doomed.append(vdir)
            if not dry_run:
                fs.remove_tree(vdir)
    return sorted(set(doomed))
