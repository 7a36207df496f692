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

from datetime import datetime, timedelta, timezone
from typing import List, Optional

from ..core import paths as vpaths
from ..core.model import (
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..core.ops import AddPartitionVersion, AddTableVersion
from ..core.version import is_valid_label
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for

_VERSION_DIR_PREFIX = vpaths.VERSION_COLUMN + "="


def _line_versions(tracker: VersionTracker, name):
    """(partition | None, version) for every Add op in ONE log, in commit
    order (oldest first)."""
    out: list[tuple[object, object]] = []
    for update in tracker.table_state(name).updates:
        for op in update.operations:
            if isinstance(op, AddPartitionVersion):
                out.append((op.partition, op.version))
            elif isinstance(op, AddTableVersion):
                out.append((None, op.version))
    return out


def _versions_ever_written(
    tracker: VersionTracker, table: TableDefinition, lines=None,
    use_index: bool = False,
):
    """(partition | None, version) for every Add op across the table's log
    AND every branch's log (branches write to the same storage location,
    so GC decisions must see their versions too), deduplicated, in commit
    order (oldest first, main log first).  ``lines`` short-circuits the
    branch enumeration when the caller already resolved it;
    ``use_index`` routes through the persisted versions index + log tail
    (spark/version_index.py) instead of re-parsing every commit."""
    if lines is None:
        from ..branching import branches

        lines = [table.name, *branches(tracker, table.name).values()]
    if use_index:
        from .version_index import line_versions_indexed

        per_line = line_versions_indexed(tracker, table, lines, use_index=True)
        streams = [per_line[name] for name in lines]
    else:
        streams = [_line_versions(tracker, name) for name in lines]
    out: list[tuple[object, object]] = []
    seen: set = set()
    for stream in streams:
        for item in stream:
            if item not in seen:
                seen.add(item)
                out.append(item)
    return out


def _label_timestamp(label: str) -> Optional[datetime]:
    """UTC timestamp embedded in a version label, or None when the label is
    not a canonical version (never treat unintelligible dirs as versions)."""
    if not is_valid_label(label) or not label:
        return None
    return datetime.strptime(label[:15], "%Y%m%d-%H%M%S")


def _orphan_version_dirs(
    fs, base: str, depth: int, known_paths: set, cutoff: datetime
) -> List[str]:
    """``_version=`` directories on storage that the log never recorded and
    that are provably older than ``cutoff``.

    Version dirs live exactly ``depth`` partition levels under ``base``;
    partition levels are ``k=v`` directories.  Anything not matching that
    shape — stray files, unparseable labels, bare adopt-in-place data — is
    left alone.  The age guard exists because a missing log entry cannot
    distinguish "crashed write" from "write still in flight between its
    data write and its commit"; a cutoff far above any real write duration
    (default 7 days) makes the sweep safe.  Age is judged by BOTH the
    label-embedded timestamp AND storage mtime — the directory's own, or
    (on object stores, whose synthesized directory prefixes carry no
    LastModified) the newest child file's — so a writer with a badly
    skewed clock, or a caller injecting a historical ``version=`` label,
    cannot have its in-flight directory swept: the freshly written files
    keep the mtime young.  With NO mtime evidence at all the directory is
    skipped — an old-looking label alone never dooms anything."""
    cutoff_epoch = cutoff.replace(tzinfo=timezone.utc).timestamp()
    out: List[str] = []

    def walk(d: str, lvl: int) -> None:
        for name in fs.list_dir(d):
            p = fs.join(d, name)
            if lvl == depth:
                if not name.startswith(_VERSION_DIR_PREFIX):
                    continue
                if p in known_paths or not fs.is_dir(p):
                    continue  # recorded, or a stray FILE masquerading
                ts = _label_timestamp(name[len(_VERSION_DIR_PREFIX):])
                if ts is None or ts >= cutoff:
                    continue
                mt = fs.mtime(p)
                if mt is None:
                    # backends without directory mtimes (object stores,
                    # memory://): fall back to the newest CHILD file's
                    # mtime — the data files a writer just landed are the
                    # real evidence of an in-flight write
                    child_mts = [
                        m
                        for m in (
                            fs.mtime(fs.join(p, c)) for c in fs.list_dir(p)
                        )
                        if m is not None
                    ]
                    mt = max(child_mts) if child_mts else None
                if mt is None:
                    # no age evidence at all: an old-looking label alone
                    # must never doom a directory a writer may still be
                    # filling (versioned_insert_into accepts caller-
                    # supplied historical labels) — skip, stay safe
                    continue
                if mt >= cutoff_epoch:
                    continue  # storage says it's younger than the label
                out.append(p)
            elif "=" in name and not name.startswith(_VERSION_DIR_PREFIX) and fs.is_dir(p):
                walk(p, lvl + 1)

    walk(base, 0)
    return out


def vacuum(
    table: TableDefinition,
    tracker: VersionTracker,
    keep_last: int = 1,
    dry_run: bool = False,
    distributed: bool = False,
    spark=None,
    sweep_orphans: bool = False,
    orphan_min_age: timedelta = timedelta(days=7),
    version_index: bool = True,
) -> List[str]:
    """Delete superseded version directories; returns the removed (or, in
    dry-run, doomed) paths.

    ``distributed=True`` issues the existence probes and deletes from
    executors (pass ``spark``); the doomed set is identical to the driver
    path — only WHERE the FS calls run changes.

    ``sweep_orphans=True`` additionally reclaims version directories the
    log never recorded — the debris of writes that crashed between their
    data write and their commit, which the log-driven candidate set cannot
    see.  This is the one vacuum mode that LISTS storage (O(partitions)
    listings, fanned out to executors under ``distributed=True``) instead
    of working from log metadata alone; only directories older than
    ``orphan_min_age`` (default 7 days, Delta's retention default) are
    eligible, so an in-flight write's not-yet-committed directory is never
    swept."""
    from ..branching import parse_branch

    if parse_branch(table.name) is not None:
        # a branch shares its source's storage; GC'ing from the branch's
        # log alone would treat main-only versions as unreferenced
        raise ValueError(
            f"{table.name} is a branch; vacuum its source table (branch "
            "versions are protected automatically)"
        )
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if distributed and spark is None:
        raise ValueError("distributed vacuum needs the SparkSession (spark=...)")
    if distributed and table.location.startswith("memory://"):
        raise ValueError(
            "memory:// storage is process-local test scaffolding; executors "
            "cannot see it — use the driver path (distributed=False)"
        )

    keep: set[tuple[str, str]] = set()

    def _keep_state(tv) -> None:
        if isinstance(tv, SnapshotTableVersion):
            keep.add(("", tv.version.label))
        elif isinstance(tv, PartitionedTableVersion):
            for partition, version in tv.partition_versions.items():
                keep.add((partition.path, version.label))

    from ..branching import branches

    # every line of history over this storage location: the table itself
    # plus all its branches — a branch's live state and tagged states are
    # as protected as main's (its branch-point tag pins the base state).
    # The Add-ops enumeration resolves through the persisted versions
    # index + log tail (spark/version_index.py) so the sweep stays
    # O(new commits) in log reads instead of re-parsing every commit of
    # every line; version_index=False (or a tracker without the tail
    # surface) restores the full walk.
    from .version_index import line_versions_indexed

    lines = [table.name, *branches(tracker, table.name).values()]
    line_entries = line_versions_indexed(
        tracker, table, lines, use_index=version_index
    )
    by_part: dict[object, list] = {}
    part_objs: dict[object, object] = {}
    seen_pv: set = set()
    for line in lines:
        _keep_state(tracker.current_version(line))
        # every TAGGED state is pinned too: a tag promises its read stays
        # reproducible, so all directories its fold references are kept
        # until the tag is deleted (checkpoint-backed trackers resolve
        # each tag O(tail), not O(log))
        for _tag, tagged_commit in sorted(tracker.tags(line).items()):
            _keep_state(tracker.version_at(line, tagged_commit))
        # ONE indexed (O(tail)) read per line feeds both the keep window
        # and the candidate set below.  The keep_last time-travel window
        # is PER LINE: each log keeps its own newest N versions per
        # partition, so branch churn can never evict main's recent
        # history from main's window (and vice versa)
        line_by_part: dict[object, list] = {}
        for partition, version in line_entries[line]:
            key = partition.path if partition is not None else ""
            line_by_part.setdefault(key, []).append(version)
            if (key, version) not in seen_pv:
                seen_pv.add((key, version))
                by_part.setdefault(key, []).append(version)
                part_objs[key] = partition
        for key, versions in line_by_part.items():
            for v in versions[-keep_last:]:
                keep.add((key, v.label))

    # deletion goes through the FS facade, so a table whose data lives on
    # an object store (s3://, memory://, any fsspec scheme) vacuums the
    # same way a local one does
    fs, location = filesystem_for(table.location)

    # ONE pass over the log metadata builds both the superseded-candidate
    # list and (for the orphan sweep) the every-recorded-version-dir set —
    # a single place resolves (partition, version) → path, so the GC
    # decision and the orphan-protection set can never diverge
    candidates: List[str] = []
    known_paths: set = set()
    for key, versions in by_part.items():
        partition = part_objs[key]
        # resolve_path applies the same Hive-style escaping the writer uses
        base = (
            partition.resolve_path(location)
            if partition is not None
            else location
        )
        for v in versions:
            if v.is_unversioned:
                # the adopt-in-place sentinel maps to the BARE partition/table
                # path (VersionPaths.scala:19-20) — deleting it would take the
                # whole table (nested _version dirs included) with it
                continue
            p = vpaths.path_for(base, v)
            known_paths.add(p)
            if (key, v.label) not in keep:
                candidates.append(p)
    if sweep_orphans:
        # partition depth from the log itself when possible (a CLI caller's
        # TableDefinition may carry a placeholder schema); schema fallback
        # only for a log with no partition writes yet
        depth = len(table.partition_schema.columns)
        for p in part_objs.values():
            if p is not None:
                depth = len(p.column_values)
                break
        cutoff = (
            datetime.now(timezone.utc).replace(tzinfo=None) - orphan_min_age
        )
        if distributed and depth >= 1:
            # one listing per partition dir: fan the subtree walks out
            first = [
                n
                for n in fs.list_dir(location)
                if "=" in n
                and not n.startswith(_VERSION_DIR_PREFIX)
                and fs.is_dir(fs.join(location, n))
            ]
            bases = [fs.join(location, n) for n in first]
            orphans: List[str] = []
            if bases:
                location_url_o = table.location

                def _walk_subtrees(bs):
                    from chronicles_spark.spark.vacuum import (
                        _orphan_version_dirs as _walk,
                    )
                    from chronicles_spark.trackers.fs import filesystem_for as _ff

                    efs, _ = _ff(location_url_o)
                    out: List[str] = []
                    for b in bs:
                        out.extend(_walk(efs, b, depth - 1, known_paths, cutoff))
                    return out

                sc = spark.sparkContext
                n_slices = max(1, min(len(bases), sc.defaultParallelism))
                orphans = (
                    sc.parallelize(bases, n_slices)
                    .mapPartitions(lambda it: _walk_subtrees(list(it)))
                    .collect()
                )
        else:
            orphans = _orphan_version_dirs(fs, location, depth, known_paths, cutoff)
        if orphans:
            # re-read the log AFTER the walk: a commit that landed while
            # the sweep listed storage legitimizes its directory — drop it
            # from the doomed set rather than deleting a just-committed dir
            fresh_known = {
                vpaths.path_for(
                    p.resolve_path(location) if p is not None else location, v
                )
                for p, v in _versions_ever_written(
                    tracker, table, use_index=version_index
                )
                if not v.is_unversioned
            }
            orphans = [p for p in orphans if p not in fresh_known]
        candidates.extend(orphans)

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
