"""Partition-level restore — ``git revert`` scoped to chosen partitions.

The reference's only rollback is ``checkout`` (VersionedMetastore.scala:71-78),
which moves the WHOLE table's head: restoring one bad partition also
rewinds every other partition written since.  ``restore_partitions``
instead creates ONE NEW commit that re-points only the chosen partitions
at the versions they had as of an older commit / tag / timestamp:

* history is preserved (the head advances; nothing is rewound),
* partitions not listed keep their current versions,
* a partition that did NOT exist at the restore point is dropped from the
  live view via a ``RemovePartition`` tombstone — "its state back then"
  was absence,
* no data moves — like checkout, this is O(#restored partitions) pure
  metadata (docs/concepts.md:80-82 economics apply).

Because old version directories may have been reclaimed by
``vacuum(keep_last=...)``, the default ``verify_exists=True`` probes every
target directory through the FS facade BEFORE committing, so a restore
can never commit pointers at deleted data.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import List, Optional, Sequence, Tuple

from ..core.diff import compute_changes
from ..core.model import Partition, TableDefinition
from ..core.ops import (
    AddPartitionVersion,
    RemovePartition,
    TableOperation,
    TableUpdate,
    TableUpdateMetadata,
)
from ..core.paths import path_for
from ..trackers.base import VersionTracker, head_of
from ..trackers.fs import filesystem_for


def restore_partitions(
    table: TableDefinition,
    tracker: VersionTracker,
    partitions: Sequence[Partition],
    user_id: str,
    message: str,
    *,
    at_commit: Optional[str] = None,
    at_tag: Optional[str] = None,
    at_timestamp=None,
    metastore=None,
    verify_exists: bool = True,
) -> Tuple[object, list]:
    """Re-point ``partitions`` at their state as of a historical point.

    Exactly one of ``at_commit`` / ``at_tag`` / ``at_timestamp`` selects
    the restore point (same resolution semantics as the read-side
    ``read_at_commit`` / ``read_at_tag`` / ``read_at_timestamp``).
    Returns ``(new_table_version, metastore_changes)`` like the other
    commit compositions.

    Raises ``ValueError`` for snapshot tables (use ``checkout`` — a
    snapshot table has exactly one version pointer, so partial restore is
    meaningless) and ``FileNotFoundError`` when ``verify_exists`` finds a
    target version directory missing (vacuumed or never written).
    """
    if table.is_snapshot:
        raise ValueError(
            "restore_partitions is for partitioned tables; use checkout "
            "for snapshot tables"
        )
    selectors = [s is not None for s in (at_commit, at_tag, at_timestamp)]
    if sum(selectors) != 1:
        raise ValueError(
            "exactly one of at_commit / at_tag / at_timestamp is required"
        )
    if not partitions:
        raise ValueError("no partitions given to restore")

    if at_tag is not None:
        at_commit = tracker.tag_commit(table.name, at_tag)
    elif at_timestamp is not None:
        at_commit = tracker.commit_at_timestamp(table.name, at_timestamp)
    then = tracker.version_at(table.name, at_commit)
    then_versions = then.partition_versions

    head = head_of(tracker, table.name)
    current = tracker.current_version(table.name).partition_versions

    ops: List[TableOperation] = []
    to_probe: List[str] = []
    for p in sorted(set(partitions), key=lambda p: p.path):
        old = then_versions.get(p)
        if old is None:
            # absent at the restore point: restore means drop from the
            # live view (no-op if it is not currently live either)
            if p in current:
                ops.append(RemovePartition(p))
            continue
        if current.get(p) == old:
            continue  # already at the target version
        if verify_exists and not old.is_unversioned:
            to_probe.append(path_for(p.resolve_path(table.location), old))
        ops.append(AddPartitionVersion(p, old))

    if verify_exists and to_probe:
        fs, _ = filesystem_for(table.location)
        missing = [d for d in to_probe if not fs.is_dir(d)]
        if missing:
            raise FileNotFoundError(
                "restore target version directories missing (vacuumed?): "
                + ", ".join(missing)
            )

    if not ops:
        # nothing to do — return current state unchanged, no empty commit
        return tracker.current_version(table.name), []

    meta = TableUpdateMetadata.new(user_id, message, datetime.now(timezone.utc))
    # optimistic append pinned to the head the restore plan was computed
    # against: a concurrent commit to DISJOINT partitions merges safely, a
    # racing write to a restored partition raises instead of being
    # silently re-pointed backwards
    tracker.commit(
        table.name, TableUpdate(meta, tuple(ops)),
        expected_head=head, allow_disjoint=True,
    )

    new_state = tracker.current_version(table.name)
    if metastore is not None:
        actual = metastore.current_version(table)
        changes = compute_changes(actual, new_state)
        metastore.update(table, changes)
    else:
        changes = []
    return new_state, changes
