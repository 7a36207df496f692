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

from typing import Iterable, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.model import (
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..trackers.base import VersionTracker, head_of
from .reader import read_version
from .writer import versioned_insert_into


def zorder_column(
    df: DataFrame,
    columns: List[str],
    bits_per_column: Optional[int] = None,
    boundaries: Optional[dict] = None,
) -> "F.Column":
    """Z-value (Morton code) expression over ``columns`` — the multi-column
    interleaved clustering key behind OPTIMIZE ZORDER.

    Each column is mapped to a quantile-based bucket id (boundaries from
    one sample-based ``approxQuantile`` pass — driver-side metadata, the
    only non-lazy step) and the buckets' bits are interleaved, so rows
    close in z-value are close in EVERY z-ordered dimension.  Quantile
    (not uniform) bucketing makes the code robust to skewed value
    distributions.  The returned expression is pure JVM column arithmetic
    (whole-stage codegen; no Python on data).

    Columns must be numeric (or castable to double; uncastable values land
    in bucket 0 with the nulls).  ``bits_per_column`` defaults to
    ``min(6, 63 // len(columns))`` — 64 buckets per column, enough for
    row-group-level locality while keeping the bucket expression (one
    comparison per boundary) small enough for whole-stage codegen."""
    if not columns:
        raise ValueError("zorder needs at least one column")
    bits = bits_per_column or min(6, 63 // len(columns))
    if bits < 1 or bits * len(columns) > 63:
        raise ValueError(
            f"{len(columns)} columns × {bits} bits exceeds a 64-bit z-value"
        )
    n_buckets = 1 << bits
    if boundaries is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        # one sampled pass over the data for ALL columns' boundaries
        numeric = df.select(
            *[F.col(c).cast("double").alias(c) for c in columns]
        )
        boundaries = dict(zip(columns, numeric.approxQuantile(columns, qs, 0.01)))
    # ``boundaries`` (column → ascending cut points, ≤ 2^bits - 1 of them)
    # is injectable for deterministic tests and for callers that already
    # know their value distribution

    z = F.lit(0).cast("long")
    for j, c in enumerate(columns):
        col = F.col(c).cast("double")
        bucket = F.lit(0)
        for b in boundaries[c]:
            bucket = bucket + F.when(col > F.lit(float(b)), 1).otherwise(0)
        bucket = F.coalesce(bucket, F.lit(0)).cast("long")  # nulls → bucket 0
        for i in range(bits):
            # bit i of this column's bucket → interleaved position i*k + j
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * len(columns) + j,
            )
    return z


def _clustering(df, part_cols, sort_by, zorder_by):
    """(df [+ a ``_chronicles_zval`` column], in-file ordering columns).
    The zval column is computed here and dropped by the caller AFTER the
    sort, so it never reaches the written files.  A user column of that
    reserved name is rejected up front — ``withColumn`` would silently
    overwrite its values and the post-sort drop would destroy it,
    violating compaction's values-unchanged contract."""
    if zorder_by:
        if "_chronicles_zval" in df.columns:
            raise ValueError(
                "input carries a column named '_chronicles_zval', which "
                "zorder compaction reserves for its sort key — rename it"
            )
        df = df.withColumn("_chronicles_zval", zorder_column(df, list(zorder_by)))
        return df, (*part_cols, "_chronicles_zval")
    if sort_by:
        return df, (*part_cols, *sort_by)
    return df, ()


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
    zorder_by: Optional[Iterable[str]] = None,
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
    scanning — the OPTIMIZE-style layout pass.  ``zorder_by`` is the
    multi-column variant (OPTIMIZE ZORDER): rows are ordered by a
    quantile-bucketed Morton code (:func:`zorder_column`), giving locality
    in EVERY listed dimension at once — the right choice when queries
    filter on several columns; ``sort_by`` beats it when one column
    dominates.  Mutually exclusive.  (Directory-level sidecar skipping is
    unaffected by either: its min-max spans the whole version directory
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
    if sort_by and zorder_by:
        raise ValueError("pass either sort_by or zorder_by, not both")
    base_head = head_of(tracker, table.name)
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
        out, order_cols = _clustering(out, (), sort_by, zorder_by)
        if order_cols:
            out = out.sortWithinPartitions(*order_cols)
            if zorder_by:  # drop only the column WE added
                out = out.drop("_chronicles_zval")
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
    out, order_cols = _clustering(out, tuple(part_cols), sort_by, zorder_by)
    if order_cols:
        # prefix with the partition columns: the dynamic-partition write
        # REQUIRES rows ordered by them and would otherwise inject its own
        # (unstable) sort, destroying the clustering; with the partition
        # cols leading, the write's required ordering is already satisfied
        # and our clustering order reaches the files intact
        out = out.sortWithinPartitions(*order_cols)
        if zorder_by:  # drop only the column WE added
            out = out.drop("_chronicles_zval")
    # the rewrite's partitions are exactly the selection — hand them over
    # so the commit never pays an O(table-partitions) directory walk
    return versioned_insert_into(
        out, table, tracker, user_id, message,
        metastore=metastore, partitions=list(selected),
        concurrency=concurrency, base_head=base_head,
        stats_columns=stats_columns,
    )
