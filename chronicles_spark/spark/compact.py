"""Small-file compaction: rewrite live partition data as a NEW version.

The reference leaves compaction to the user (same bucket as version GC,
README.md:51-52), but a versioned lake makes it trivially safe: read the
LIVE version of each selected partition, coalesce to a target file count,
and write the result back through the normal ``versioned_insert_into``
path.  The rewrite is just another commit — readers see the old files
until the atomic pointer swap, time travel to pre-compaction commits still
works (the old version directories are untouched), and ``vacuum`` reclaims
them later.  This matters most for streaming ingest (the append-mode sink
rewrites touched partitions every micro-batch, accreting small files) —
periodic compaction is the standard companion job.

Scale shape: one read of the selected partitions' live data, one
``repartition`` shuffle sized by the caller's target, one partitionBy
write, one O(metadata) commit.  Partitions not selected are untouched —
their pointers don't change, so compacting one hot partition of a
100k-partition table moves only that partition's bytes.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import SparkSession, functions as F

from ..core.model import (
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..trackers.base import VersionTracker
from .reader import read_version
from .writer import versioned_insert_into


def compact_partitions(
    spark: SparkSession,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    partitions: Optional[Iterable[Partition]] = None,
    files_per_partition: int = 1,
    message: str = "compact",
    metastore=None,
    concurrency: str = "optimistic",
    sort_by: Optional[Iterable[str]] = None,
    stats_columns=None,
):
    """Rewrite the live data of ``partitions`` (default: all) into
    ``files_per_partition`` files each, as a fresh committed version.

    Returns ``(table_version, changes)`` from the underlying commit.
    Values are unchanged — only the file layout (and version) moves.

    ``sort_by`` CLUSTERS each rewritten file on the given data columns
    (``sortWithinPartitions`` — no extra shuffle beyond the compaction's
    own).  That tightens parquet ROW-GROUP min-max ranges, so any engine's
    row-group predicate pushdown on those columns skips instead of
    scanning — the OPTIMIZE-style layout pass.  (Directory-level sidecar
    skipping is unaffected: its min-max spans the whole version directory
    regardless of row order.)  ``stats_columns`` forwards to the write's
    sidecar harvest so the compacted version keeps its data-skipping
    sidecars.

    Compaction is a read-modify-write, so it commits OPTIMISTICALLY by
    default (``concurrency="optimistic"``): if a concurrent writer
    overwrites one of the selected partitions while the rewrite runs,
    the commit raises ``CommitConflictError`` instead of silently
    reverting that partition to its pre-compaction rows; writers on
    OTHER partitions auto-merge.  Re-run to retry (the stale rewrite's
    files stay invisible).  Pass ``concurrency="last-writer-wins"`` to
    restore unchecked commits."""
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    base_head = tracker.table_state(table.name).current_version
    current = tracker.current_version(table.name)

    if isinstance(current, SnapshotTableVersion):
        if current.version.is_unversioned:
            # UNVERSIONED = never written, OR adopt-in-place data at the
            # bare table path; only the latter has bytes to compact
            from ..trackers.fs import filesystem_for

            fs, root = filesystem_for(table.location)
            if not fs.exists(root):
                raise ValueError(f"table {table.name} has no live data to compact")
        df = read_version(spark, table, current)
        out = df.repartition(files_per_partition)
        if sort_by:
            out = out.sortWithinPartitions(*sort_by)
        return versioned_insert_into(
            out, table, tracker, user_id, message, metastore=metastore,
            concurrency=concurrency, base_head=base_head,
            stats_columns=stats_columns,
        )

    assert isinstance(current, PartitionedTableVersion)
    # materialize once: a generator argument must not be re-consumed per item
    wanted = None if partitions is None else set(partitions)
    selected = {
        p: v
        for p, v in current.partition_versions.items()
        if wanted is None or p in wanted
    }
    if not selected:
        raise ValueError("no live partitions match the compaction selection")

    # exact directory strings (no partition-type inference): a value like
    # '01' must not round-trip through int 1 and land under 'd=1'
    df = read_version(
        spark, table, PartitionedTableVersion(selected), infer_partition_types=False
    )
    part_cols = list(table.partition_schema.columns)

    if files_per_partition == 1:
        # all rows of one Hive partition into one task → one file per dir
        out = df.repartition(max(len(selected), 1), *[F.col(c) for c in part_cols])
    else:
        # deterministic row-hash salt splits each partition into exactly
        # files_per_partition groups
        salt = F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition))
        out = df.repartition(
            len(selected) * files_per_partition,
            *[F.col(c) for c in part_cols],
            salt,
        )
    if sort_by:
        # prefix with the partition columns: the dynamic-partition write
        # REQUIRES rows ordered by them and would otherwise inject its own
        # (unstable) sort, destroying the clustering; with the partition
        # cols leading, the write's required ordering is already satisfied
        # and our sort_by order reaches the files intact
        out = out.sortWithinPartitions(*part_cols, *sort_by)
    # the rewrite's partitions are exactly the selection — hand them over
    # so the commit never pays an O(table-partitions) directory walk
    return versioned_insert_into(
        out, table, tracker, user_id, message,
        metastore=metastore, partitions=list(selected),
        concurrency=concurrency, base_head=base_head,
        stats_columns=stats_columns,
    )
