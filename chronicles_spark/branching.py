"""Branches: isolated staging lines for Write-Audit-Publish workflows.

The reference is "git for data" with ONE line of history per table
(docs/concepts.md:88; VersionTracker.scala:112-135 — a single ordered log
+ head pointer).  This module adds git-style BRANCHES on top of the
existing tracker surface, enabling the lakehouse Write-Audit-Publish
(WAP) pattern: write new data to a staging branch, audit it with the
quality/dedup operators, then publish by merging into the main table —
readers of the main table never see unaudited data.

Design (works on every tracker backend unchanged):

* A branch IS a tracked table named ``<name>__branch_<branch>`` in the
  same schema — all existing machinery (commits, folds, tags, time
  travel, checkpoints, optimistic concurrency) applies verbatim.
* Branch creation commits ONE synthetic "branch base" commit capturing
  the resolved state at the branch point — O(#live partitions) metadata,
  NOT O(log); at a million-commit log that is the difference between a
  snapshot and a full history copy.  (Consequence: time travel WITHIN a
  branch only reaches back to its creation; the source table keeps the
  deep history.)  The base commit is pinned by a ``branch-point`` tag,
  which doubles as vacuum protection for the base state.
* Branch writes go to the SAME storage location under fresh ``_version=``
  directories — invisible to main-table readers until merged (the same
  invisible-until-commit property the write path already has,
  docs/concepts.md:71-75).
* ``merge_branch`` computes the partitions changed on the branch since
  the base, checks main has not changed those same partitions (partition-
  level three-way merge), and lands them as ONE commit on main using the
  optimistic-commit path — concurrent main writers to other partitions
  are safe; a concurrent change to a merged partition raises.
* No data ever moves or copies: create, merge, and delete are all pure
  metadata, like checkout (docs/concepts.md:80-82).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

from .core.diff import compute_changes
from .core.model import (
    PartitionedTableVersion,
    PartitionSchema,
    SnapshotTableVersion,
    TableDefinition,
    TableName,
)
from .core.ops import (
    AddPartitionVersion,
    AddTableVersion,
    RemovePartition,
    TableOperation,
    TableUpdate,
    TableUpdateMetadata,
)
from .trackers.base import VersionTracker, head_of

BRANCH_INFIX = "__branch_"
BRANCH_POINT_TAG = "branch-point"
_BRANCH_NAME_RE = re.compile(r"^[a-z][a-z0-9_]*$")


class BranchError(ValueError):
    """Invalid branch operation (bad name, exists/missing, nested branch)."""


class MergeConflictError(RuntimeError):
    """Main changed partitions the branch also changed since the base."""

    def __init__(self, table: TableName, branch: str, partitions: List[str]):
        self.partitions = list(partitions)
        super().__init__(
            f"cannot merge branch {branch!r} into {table}: partitions "
            f"changed on both sides since the branch point: "
            + ", ".join(partitions)
        )


def branch_table_name(table: TableName, branch: str) -> TableName:
    """The tracker-level name a branch is stored under."""
    _validate_branch_name(branch)
    if BRANCH_INFIX in table.name:
        raise BranchError(f"cannot branch a branch ({table.fully_qualified})")
    return TableName(table.schema, f"{table.name}{BRANCH_INFIX}{branch}")


def parse_branch(table: TableName) -> Optional[Tuple[TableName, str]]:
    """(source table, branch name) if ``table`` is a branch, else None."""
    if BRANCH_INFIX not in table.name:
        return None
    base, _, branch = table.name.rpartition(BRANCH_INFIX)
    return TableName(table.schema, base), branch


def branches(tracker: VersionTracker, table: TableName) -> Dict[str, TableName]:
    """branch name → tracker table name, for every branch of ``table``."""
    out: Dict[str, TableName] = {}
    for t in tracker.tables():
        parsed = parse_branch(t)
        if parsed and parsed[0] == table:
            out[parsed[1]] = t
    return out


def _validate_branch_name(branch: str) -> None:
    if not _BRANCH_NAME_RE.match(branch) or BRANCH_INFIX in branch:
        raise BranchError(
            f"invalid branch name {branch!r} (want [a-z][a-z0-9_]*)"
        )


def _state_ops(tv) -> List[TableOperation]:
    if isinstance(tv, SnapshotTableVersion):
        return [] if tv.version.is_unversioned else [AddTableVersion(tv.version)]
    assert isinstance(tv, PartitionedTableVersion)
    return [
        AddPartitionVersion(p, v)
        for p, v in sorted(tv.partition_versions.items(), key=lambda kv: kv[0].path)
    ]


def create_branch(
    tracker: VersionTracker,
    table: TableName,
    branch: str,
    user_id: str,
    at_commit: Optional[str] = None,
    location: Optional[str] = None,
) -> TableName:
    """Create ``branch`` from ``table``'s state at ``at_commit`` (default:
    the current head).  Returns the branch's tracker table name.

    Pure metadata: one init commit + one base-state commit of
    O(#live partitions) ops.  Raises BranchError if the branch exists.
    ``location`` (the table's storage root, when the caller has it) clears
    any schema sidecar a previously-deleted branch of the same name left
    behind, so guarded writes start from main's recorded schema.
    """
    btn = branch_table_name(table, branch)
    if btn in tracker.tables():
        raise BranchError(f"branch {branch!r} of {table} already exists")
    # resolve (and thereby validate) the base state BEFORE any cleanup:
    # an UnknownCommitError/UnknownTableError must leave no side effects —
    # in particular a dead prior branch's schema sidecar must survive a
    # failed create attempt
    is_snapshot = tracker.is_snapshot_table(table)
    base_state = (
        tracker.current_version(table)
        if at_commit is None
        else tracker.version_at(table, at_commit)
    )
    if location:
        from .spark.schema_guard import drop_branch_schema

        drop_branch_schema(
            TableDefinition(btn, location, PartitionSchema(("p",)))
        )
    now = datetime.now(timezone.utc)
    tracker.init_table(
        btn, is_snapshot, user_id,
        f"branch {branch!r} of {table.fully_qualified}", now,
    )
    ops = _state_ops(base_state)
    if ops:
        meta = TableUpdateMetadata.new(
            user_id, f"branch base from {table.fully_qualified}", now
        )
        tracker.commit(btn, TableUpdate(meta, tuple(ops)))
        base_commit = meta.commit_id
    else:
        # branched from an empty table: the init commit is the base
        base_commit = head_of(tracker, btn)
    tracker.set_tag(btn, BRANCH_POINT_TAG, base_commit)
    return btn


def branch_table_def(table: TableDefinition, branch: str) -> TableDefinition:
    """TableDefinition for reading/writing a branch: same location, same
    partitioning — only the tracked name differs."""
    return TableDefinition(
        branch_table_name(table.name, branch),
        table.location,
        table.partition_schema,
        table.format,
        table.format_options,
    )


def delete_branch(
    tracker: VersionTracker,
    table: TableName,
    branch: str,
    location: Optional[str] = None,
) -> None:
    """Drop a branch's log (and thereby its vacuum protection).  Data
    directories only the branch referenced become vacuum-eligible
    orphans; the source table is untouched.  Pass ``location`` (the
    table's storage root) to also remove the branch's schema sidecar so a
    future branch of the same name cannot inherit a dead branch's
    schema."""
    btn = branch_table_name(table, branch)
    if btn not in tracker.tables():
        raise BranchError(f"no branch {branch!r} of {table}")
    tracker.drop_table(btn)
    if location:
        from .spark.schema_guard import drop_branch_schema

        drop_branch_schema(
            TableDefinition(btn, location, PartitionSchema(("p",)))
        )


def merge_branch(
    table: TableDefinition,
    tracker: VersionTracker,
    branch: str,
    user_id: str,
    message: str,
    metastore=None,
    drop_branch: bool = False,
    on_conflict: str = "error",
) -> Tuple[object, list]:
    """Publish a branch: land its changes-since-base on main as ONE commit.

    Partition-level three-way merge: a partition changed (or removed) on
    the branch merges iff main still has the base's version for it;
    otherwise :class:`MergeConflictError` lists the contested partitions.
    Snapshot tables merge the branch's head version the same way.  The
    commit uses the optimistic path (``expected_head``), so a main commit
    racing the merge to a DISJOINT partition set is safe and an
    overlapping one conflicts instead of being silently overwritten.

    Returns ``(new main state, metastore changes)``.  ``drop_branch=True``
    deletes the branch after a successful merge (a no-change merge also
    drops it — the WAP "publish" is complete either way).

    ``on_conflict``: ``"error"`` (default) raises MergeConflictError;
    ``"theirs"`` publishes the branch's version for contested partitions
    anyway (forced publish — the audited branch is authoritative);
    ``"ours"`` keeps main's version for contested partitions and merges
    the rest.  Prefer :func:`rebase_branch` + re-audit when the contested
    data matters.
    """
    if on_conflict not in ("error", "theirs", "ours"):
        raise ValueError(
            f"on_conflict must be 'error', 'theirs' or 'ours', got {on_conflict!r}"
        )
    btn = branch_table_name(table.name, branch)
    if btn not in tracker.tables():
        raise BranchError(f"no branch {branch!r} of {table.name}")

    base_commit = tracker.tag_commit(btn, BRANCH_POINT_TAG)
    base = tracker.version_at(btn, base_commit)
    br = tracker.current_version(btn)
    main_head = head_of(tracker, table.name)
    main = tracker.current_version(table.name)

    ops: List[TableOperation] = []
    conflicts: List[str] = []

    def _take_branch_side(p, b1) -> None:
        if b1 is None:
            if p is not None:
                ops.append(RemovePartition(p))
        elif p is None:
            ops.append(AddTableVersion(b1))
        else:
            ops.append(AddPartitionVersion(p, b1))

    if isinstance(br, SnapshotTableVersion):
        if br.version != base.version and main.version != br.version:
            if main.version != base.version:
                conflicts.append("<table version>")
                if on_conflict == "theirs":
                    _take_branch_side(None, br.version)
            else:
                ops.append(AddTableVersion(br.version))
    else:
        base_pv = base.partition_versions
        br_pv = br.partition_versions
        main_pv = main.partition_versions
        for p in sorted(set(base_pv) | set(br_pv), key=lambda p: p.path):
            b0, b1 = base_pv.get(p), br_pv.get(p)
            if b0 == b1:
                continue  # untouched on the branch
            m = main_pv.get(p)
            if m == b1:
                continue  # both sides made the IDENTICAL change — clean
            if m != b0:
                conflicts.append(p.path)
                if on_conflict == "theirs":
                    _take_branch_side(p, b1)
            elif b1 is None:
                ops.append(RemovePartition(p))
            else:
                ops.append(AddPartitionVersion(p, b1))
    if conflicts and on_conflict == "error":
        raise MergeConflictError(table.name, branch, conflicts)

    bdef = branch_table_def(table, branch)
    if ops:
        meta = TableUpdateMetadata.new(
            user_id, message, datetime.now(timezone.utc)
        )
        tracker.commit(
            table.name,
            TableUpdate(meta, tuple(ops)),
            expected_head=main_head,
            allow_disjoint=True,
        )
    # publish the branch's recorded schema even when NO data ops landed
    # (all contested partitions resolved 'ours', or the branch's changes
    # already on main): guarded branch writes can evolve the schema
    # independently of partition state, and drop_branch below deletes the
    # branch sidecar — promoting only under `ops` would silently lose
    # that evolution on a no-op merge
    if table.location:
        from .spark.schema_guard import promote_schema

        promote_schema(
            table, bdef, meta.commit_id if ops else main_head
        )

    new_state = tracker.current_version(table.name)
    if metastore is not None and ops:
        actual = metastore.current_version(table)
        changes = compute_changes(actual, new_state)
        metastore.update(table, changes)
    else:
        changes = []
    if drop_branch:
        tracker.drop_table(btn)
        if table.location:
            from .spark.schema_guard import drop_branch_schema

            drop_branch_schema(bdef)
    return new_state, changes


def rebase_branch(
    table: TableDefinition,
    tracker: VersionTracker,
    branch: str,
    user_id: str,
    on_conflict: str = "error",
) -> Tuple[object, List[str]]:
    """Re-base a branch onto main's CURRENT state (git rebase for
    partitions), so a branch whose merge conflicts can pick up main's
    progress, be re-audited, and then merge clean.

    Two commits land on the BRANCH (main is never touched):

    1. a new base-state commit transforming the branch's view to exactly
       main's current state — the ``branch-point`` tag is force-moved here;
    2. a replay commit re-applying the branch's changes-since-old-base on
       top of it.

    A partition changed on BOTH sides since the old base conflicts:
    ``on_conflict="error"`` raises before anything is committed;
    ``"theirs"`` keeps the branch's version in the replay; ``"ours"``
    drops the branch's change (main's version stands).  Returns
    ``(new branch state, conflicted partition paths)``.
    """
    if on_conflict not in ("error", "theirs", "ours"):
        raise ValueError(
            f"on_conflict must be 'error', 'theirs' or 'ours', got {on_conflict!r}"
        )
    btn = branch_table_name(table.name, branch)
    if btn not in tracker.tables():
        raise BranchError(f"no branch {branch!r} of {table.name}")
    if tracker.is_snapshot_table(table.name):
        raise BranchError(
            "rebase is for partitioned tables; re-create the branch for a "
            "snapshot table (its whole state is one version pointer)"
        )

    base = tracker.version_at(
        btn, tracker.tag_commit(btn, BRANCH_POINT_TAG)
    ).partition_versions
    br = tracker.current_version(btn).partition_versions
    main = tracker.current_version(table.name).partition_versions

    # branch's own changes since the old base, minus conflicts per policy
    replay: List[TableOperation] = []
    conflicts: List[str] = []
    for p in sorted(set(base) | set(br), key=lambda p: p.path):
        b0, b1 = base.get(p), br.get(p)
        if b0 == b1:
            continue
        m = main.get(p)
        if m == b1:
            continue  # main already carries the branch's change
        if m != b0:
            conflicts.append(p.path)
            if on_conflict != "theirs":
                continue  # 'ours': main's version stands
        if b1 is None:
            if p in main:
                replay.append(RemovePartition(p))
        else:
            replay.append(AddPartitionVersion(p, b1))
    if conflicts and on_conflict == "error":
        raise MergeConflictError(table.name, branch, conflicts)

    # commit 1: branch view := main's current state
    sync_ops: List[TableOperation] = []
    for p in sorted(set(br) | set(main), key=lambda p: p.path):
        if main.get(p) is None:
            sync_ops.append(RemovePartition(p))
        elif br.get(p) != main[p]:
            sync_ops.append(AddPartitionVersion(p, main[p]))
    meta1 = TableUpdateMetadata.new(
        user_id, f"rebase base onto {table.name.fully_qualified}",
        datetime.now(timezone.utc),
    )
    if sync_ops:
        tracker.commit(btn, TableUpdate(meta1, tuple(sync_ops)))
        tracker.set_tag(btn, BRANCH_POINT_TAG, meta1.commit_id, force=True)
    else:
        # branch view already equals main: just move the base marker
        tracker.set_tag(
            btn, BRANCH_POINT_TAG,
            head_of(tracker, btn), force=True,
        )

    # commit 2: replay the branch's changes on the fresh base
    if replay:
        meta2 = TableUpdateMetadata.new(
            user_id, "rebase replay", datetime.now(timezone.utc)
        )
        tracker.commit(btn, TableUpdate(meta2, tuple(replay)))
    return tracker.current_version(btn), conflicts
