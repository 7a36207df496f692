"""The commit-log algebra as distributed DataFrame computations.

These re-express the reference's driver-side metadata folds as Catalyst
plans, so the same algebra scales to logs with millions of partitions
(Delta-scale metadata) without driver materialization:

* V4 ``currentVersion`` fold → windowed argmax over (part) ordered by
  sequence (reference semantics: core/.../VersionTracker.scala:37-55,156-183);
* M12 ``computeChanges`` diff → FULL OUTER JOIN + classification
  (reference: core/.../Metastore.scala:56-84);
* V5 ``updates`` / V8 ``tableState`` → filter/sort and group-collect over
  the joined log (reference SQL shape: db/.../DbVersionTracker.scala:239-256).

Scale notes:
- The fold's only shuffle is the window partition by (table_name, part) —
  exactly the key the result is keyed by; no driver collect.
- The diff joins two folded states on their natural key; both sides arrive
  pre-partitioned by the window, so AQE can often avoid a second exchange.
- For a billion-row log, checkpointing folded state (Delta-style) drops
  the window input to the tail since the checkpoint; the fold is
  associative so this composes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

ADD_PART = "add_part_version"
REMOVE_PART = "remove_part"
ADD_TABLE = "add_table_version"
INIT = "init_table"


def _cutoff(ops: DataFrame, head: DataFrame | None) -> DataFrame:
    """Apply the time-travel cutoff: keep ops with sequence_id <= head_seq
    of their table (VersionTracker.scala:41-44). head=None → no cutoff."""
    if head is None:
        return ops
    return ops.join(F.broadcast(head), "table_name").where(
        F.col("sequence_id") <= F.col("head_seq")
    )


def current_version_fold(
    ops: DataFrame, head: DataFrame | None = None, table_name: str | None = None
) -> DataFrame:
    """V4 for partitioned tables: last operation per partition wins; a
    trailing remove is a tombstone. Returns (part, version).

    The window argmax is the distributed equivalent of the reference's
    in-order map fold (VersionTracker.scala:156-172)."""
    df = _cutoff(ops, head)
    if table_name is not None:
        df = df.where(F.col("table_name") == table_name)
    df = df.where(F.col("operation_type").isin(ADD_PART, REMOVE_PART))
    # key is (table_name, part): identical partition strings in different
    # tables must fold independently even when table_name is None
    w = W.partitionBy("table_name", "part").orderBy(
        F.col("sequence_id").desc(), F.col("index_in_commit").desc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") == 1) & (F.col("operation_type") == ADD_PART))
        .select("part", "version")
    )


def snapshot_version_fold(
    ops: DataFrame, head: DataFrame | None = None, table_name: str | None = None
) -> DataFrame:
    """V4 for snapshot tables: last AddTableVersion wins
    (VersionTracker.scala:177-183). With a concrete ``table_name``, returns
    one row (current_table_version); with ``table_name=None`` on a
    multi-table log, returns one row per table (table_name,
    current_table_version) — tables never clobber each other."""
    df = _cutoff(ops, head)
    agg = F.max_by("version", F.struct("sequence_id", "index_in_commit")).alias(
        "current_table_version"
    )
    if table_name is not None:
        return df.where(
            (F.col("table_name") == table_name)
            & (F.col("operation_type") == ADD_TABLE)
        ).agg(agg)
    return (
        df.where(F.col("operation_type") == ADD_TABLE)
        .groupBy("table_name")
        .agg(agg)
    )


def fold_state_checkpoint(
    ops: DataFrame, upto_seq: int, table_name: str | None = None
) -> DataFrame:
    """Folded partition state at ``sequence_id <= upto_seq`` — the frame a
    metadata pipeline persists as a Delta-style checkpoint.  Returns
    (table_name, part, version) with tombstoned partitions already dropped.

    At a billion-row log this is written to parquet periodically; the live
    fold then reads only the tail (see
    :func:`current_version_fold_incremental`)."""
    df = ops.where(F.col("sequence_id") <= upto_seq)
    if table_name is not None:
        df = df.where(F.col("table_name") == table_name)
    df = df.where(F.col("operation_type").isin(ADD_PART, REMOVE_PART))
    w = W.partitionBy("table_name", "part").orderBy(
        F.col("sequence_id").desc(), F.col("index_in_commit").desc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") == 1) & (F.col("operation_type") == ADD_PART))
        .select("table_name", "part", "version")
    )


def current_version_fold_incremental(
    ops: DataFrame,
    checkpoint: DataFrame,
    checkpoint_seq: int,
    head: DataFrame | None = None,
    table_name: str | None = None,
) -> DataFrame:
    """V4 fold reading ONLY the log tail past a checkpoint.

    The fold is a last-writer-wins map merge, which is associative:
    fold(log) == merge(fold(log[..S]), fold(log[S..])).  So the window
    input shrinks from the whole log to the tail since the checkpoint —
    the optimization the module docstring's scale note promises
    (``docs`` Delta checkpointing analogue; reference semantics unchanged,
    core/.../VersionTracker.scala:156-172).

    ``checkpoint`` is :func:`fold_state_checkpoint` output (possibly read
    back from parquet); ``checkpoint_seq`` must be <= the head cutoff.
    Output equals :func:`current_version_fold` over the full log."""
    tail = _cutoff(ops, head)
    if table_name is not None:
        tail = tail.where(F.col("table_name") == table_name)
        checkpoint = checkpoint.where(F.col("table_name") == table_name)
    tail = tail.where(
        (F.col("sequence_id") > checkpoint_seq)
        & F.col("operation_type").isin(ADD_PART, REMOVE_PART)
    )
    w = W.partitionBy("table_name", "part").orderBy(
        F.col("sequence_id").desc(), F.col("index_in_commit").desc()
    )
    tail_last = (
        tail.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "table_name",
            "part",
            F.col("operation_type").alias("tail_op"),
            F.col("version").alias("tail_version"),
        )
    )
    ckpt = checkpoint.select(
        "table_name", "part", F.col("version").alias("ckpt_version")
    )
    merged = ckpt.join(tail_last, ["table_name", "part"], "full_outer")
    return (
        merged.where(
            # tail ADD wins; tail REMOVE tombstones; no tail op → checkpoint
            (F.col("tail_op") == ADD_PART)
            | (F.col("tail_op").isNull() & F.col("ckpt_version").isNotNull())
        )
        .select(
            "part",
            F.coalesce(F.col("tail_version"), F.col("ckpt_version")).alias("version"),
        )
    )


def compute_changes_df(current: DataFrame, target: DataFrame) -> DataFrame:
    """M12 as a FULL OUTER JOIN diff (Metastore.scala:56-84).

    Inputs are folded states (part, version); output rows are the metastore
    operations needed to move current → target."""
    c = current.select(F.col("part").alias("c_part"), F.col("version").alias("c_version"))
    t = target.select(F.col("part").alias("t_part"), F.col("version").alias("t_version"))
    joined = c.join(t, c.c_part == t.t_part, "full_outer")
    return (
        joined.where(
            F.col("c_part").isNull()
            | F.col("t_part").isNull()
            | (F.col("c_version") != F.col("t_version"))
        )
        .select(
            F.coalesce(F.col("c_part"), F.col("t_part")).alias("part"),
            F.when(F.col("c_part").isNull(), F.lit("add_partition"))
            .when(F.col("t_part").isNull(), F.lit("remove_partition"))
            .otherwise(F.lit("update_partition_version"))
            .alias("change_type"),
            F.col("t_version").alias("new_version"),
        )
    )


def updates_log(ops: DataFrame) -> DataFrame:
    """V5: commit history, most recent first (VersionTracker.scala:58-61).
    One row per commit = the index_in_commit=0 row of each."""
    return (
        ops.where(F.col("index_in_commit") == 0)
        .select("sequence_id", "commit_id", "table_name", "user_id", "message")
        .orderBy(F.col("sequence_id").desc())
    )


def table_state_group(ops: DataFrame) -> DataFrame:
    """V8: reassemble commits from flattened op rows — groupBy(commit) +
    order-preserving collect (reference: db/.../DbVersionTracker.scala:67-84
    ``groupAdjacentBy``). Ops are rendered as a CSV in index order so the
    result is hashable by the oracle."""
    return (
        ops.groupBy("commit_id")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("index_in_commit", "operation_type"))
                    ),
                    lambda s: s.operation_type,
                ),
                ",",
            ).alias("ops_csv"),
        )
        .orderBy("commit_id")
    )


def tables_list(ops: DataFrame) -> DataFrame:
    """V1: all tracked tables (VersionTracker.scala:19)."""
    return ops.select("table_name").distinct().orderBy("table_name")


def is_snapshot(ops: DataFrame) -> DataFrame:
    """V7: the isSnapshot flag off each table's InitTable op
    (VersionTracker.scala:76)."""
    return (
        ops.where(F.col("operation_type") == INIT)
        .select("table_name", "is_snapshot_table")
        .orderBy("table_name")
    )
