"""Streaming ingest into a versioned table: Structured Streaming →
micro-batch commits.

The reference (stettix/chronicles) is batch-only (SURVEY §2.6); this module
is part of the training-data-pipeline extension.  The composition is the
canonical Spark shape for transactional sinks: ``writeStream.foreachBatch``
hands each micro-batch to the exact same ``versioned_insert_into`` path the
batch API uses (spark/.../VersionContext.scala:51-104 parity), so every
micro-batch becomes one commit in the version tracker's log.

IMPORTANT — partition semantics. ``versioned_insert_into`` OVERWRITES each
partition it touches (a new ``_version=`` supersedes the old one). For a
steady-state stream, one date partition's rows normally arrive across MANY
micro-batches, so naive per-batch supersession silently drops previously
ingested rows from the current view. The ``mode`` parameter makes the
choice explicit:

* ``mode="append"`` (default, safe): before committing, each batch is
  unioned with the CURRENT LIVE rows of exactly the partitions it touches,
  so the fresh version is cumulative — true append semantics at the cost of
  rewriting the touched partitions' live data each batch (O(touched
  partitions), never the whole table). Replayed epochs are detected via the
  commit log (the epoch id is part of the commit message) and skipped, so a
  checkpoint replay cannot double rows: batch-level exactly-once.
* ``mode="overwrite_partitions"``: reference-parity supersession. Each
  micro-batch's version replaces the live version of every partition it
  touches. ONLY correct when every micro-batch carries WHOLE partitions
  (e.g. a catch-up ingest where source files are partition-aligned).
  Replay is naturally idempotent (the replayed version supersedes).
* ``mode="strict"``: like ``overwrite_partitions`` but fails fast with
  ``ValueError`` if a batch touches a partition (or, for snapshot tables,
  a table version) that is already live — turns the silent-data-loss
  scenario into an error.

ONE SINK PER (table, message_prefix): the replay guard keys on the latest
commit carrying ``message_prefix`` and on monotonic epoch ids.  An epoch
EQUAL to the latest committed one is the crash-replay case and is skipped;
an epoch BEHIND it (two sinks sharing a prefix, or a wiped checkpoint
reusing epoch ids) raises ``RuntimeError`` rather than silently dropping
fresh batches.  Give every sink/checkpoint its own ``message_prefix``.

At scale: each micro-batch shuffles only its own partitions (plus, in
append mode, a scan of the touched partitions' live directories).  The
commit is O(metadata).  Backpressure / trigger sizing is the caller's
choice (``trigger(availableNow=True)`` for catch-up ingest,
processing-time triggers for steady state).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..core.model import PartitionedTableVersion, SnapshotTableVersion, TableDefinition
from ..spark.reader import read_version
from ..spark.writer import partition_values, versioned_insert_into
from ..trackers.base import VersionTracker

_MODES = ("append", "overwrite_partitions", "strict")


def _latest_stream_epoch(
    tracker: VersionTracker, table_name, message_prefix: str
) -> Optional[int]:
    """Epoch id of the NEWEST commit carrying ``message_prefix``, or None.

    Scans the log BACKWARDS in fixed-size chunks where the tracker
    offers the seq-slice surface (files + sqlite), so on a maintained
    stream log — where nearly every commit carries the prefix — the
    restart probe reads O(1) commit records instead of materializing
    the whole log (round-11, same O(tail) discipline as
    ``pinned_state``).  A log with NO stream commits still walks all of
    it, once; the sink amortizes either way: :func:`versioned_stream_
    sink` passes a per-query ``epoch_cache`` so only the FIRST
    micro-batch after (re)start pays the probe; later batches read the
    cached epoch."""
    prefix = f"{message_prefix} epoch "

    def _epoch_of(u) -> Optional[int]:
        m = u.metadata.message
        if m.startswith(prefix):
            try:
                # split: pair-publishing sinks (the ANN index extend)
                # append an opaque marker suffix after the epoch number
                return int(m[len(prefix):].split(" ", 1)[0])
            except ValueError:
                return None  # manual commit that merely resembles it
        return None

    update_seqs = getattr(tracker, "update_seqs", None)
    in_range = getattr(tracker, "updates_in_seq_range", None)
    if update_seqs is not None and in_range is not None:
        seqs = update_seqs(table_name)
        hi = len(seqs)
        while hi > 0:
            lo = max(0, hi - 64)
            for u in reversed(
                list(in_range(table_name, seqs[lo] - 1, seqs[hi - 1]))
            ):
                e = _epoch_of(u)
                if e is not None:
                    return e
            hi = lo
        return None
    for u in reversed(list(tracker.table_state(table_name).updates)):
        e = _epoch_of(u)
        if e is not None:
            return e
    return None


def epoch_replay_guard(
    tracker: VersionTracker,
    table_name,
    message_prefix: str,
    epoch_id: int,
    epoch_cache: Optional[dict],
) -> bool:
    """Shared replay/regression guard for epoch-keyed streaming sinks
    (this module's versioned sink AND the ANN index's
    :func:`~chronicles_spark.operators.ann_index.ann_stream_sink`).
    Returns True when ``epoch_id`` is a checkpoint REPLAY of the latest
    committed epoch (caller must skip the batch); raises RuntimeError
    when it is BEHIND the latest (a wiped checkpoint reusing ids under
    the same prefix would otherwise silently drop fresh batches);
    updates ``epoch_cache`` with the derived latest epoch."""
    latest = (
        epoch_cache.get("latest_epoch") if epoch_cache is not None else None
    )
    if latest is None:
        latest = _latest_stream_epoch(tracker, table_name, message_prefix)
    if latest is not None:
        if epoch_cache is not None:
            epoch_cache["latest_epoch"] = latest
        if latest == epoch_id:
            return True
        if latest > epoch_id:
            raise RuntimeError(
                f"epoch {epoch_id} is behind the latest committed epoch "
                f"{latest} for message_prefix {message_prefix!r} — a "
                "fresh/wiped checkpoint reuses epoch ids; give this "
                "sink a new message_prefix"
            )
    return False


def _align(live: DataFrame, batch_df: DataFrame) -> DataFrame:
    """Partition-column types are recovered from directory names on read;
    align the live frame to the batch schema before a union."""
    return live.select(
        [F.col(c).cast(batch_df.schema[c].dataType).alias(c) for c in batch_df.columns]
    )


def commit_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    metastore=None,
    message_prefix: str = "stream",
    mode: str = "append",
    epoch_cache: Optional[dict] = None,
    stats_columns=None,
) -> None:
    """Land ONE micro-batch as a versioned commit (the ``foreachBatch``
    body of :func:`versioned_stream_sink`, exposed for direct use/testing).

    ``epoch_cache`` (a mutable dict owned by one streaming query) caches
    the latest committed epoch between batches so the replay guard's full
    log read happens once per (re)start, not once per micro-batch.  It
    must never be shared across sinks with different ``message_prefix``.

    See the module docstring for ``mode`` semantics."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    if batch_df.isEmpty():
        return
    message = f"{message_prefix} epoch {epoch_id}"
    # replay guard for append AND strict: a stream that crashed after
    # commit but before the checkpoint advanced replays its LAST epoch on
    # restart — skip it (append would double rows; strict would see its own
    # partitions live and raise forever).  A checkpoint can only replay the
    # latest in-flight epoch, so a batch whose epoch is STRICTLY below the
    # latest committed one means the checkpoint was wiped/replaced while
    # the message_prefix was reused — that would silently skip fresh data;
    # fail loudly instead.
    if mode in ("append", "strict"):
        if epoch_replay_guard(
            tracker, table.name, message_prefix, epoch_id, epoch_cache
        ):
            return  # checkpoint replay of the just-committed epoch

    try:
        part_cols = table.partition_schema.columns
        out = batch_df
        if mode in ("append", "strict"):
            current = tracker.current_version(table.name)
            if isinstance(current, PartitionedTableVersion) and part_cols:
                batch_df = batch_df.persist()
                try:
                    touched = partition_values(batch_df, part_cols)
                    touched_set = set(touched)
                    overlap = {
                        p: v
                        for p, v in current.partition_versions.items()
                        if p in touched_set
                    }
                    if overlap and mode == "strict":
                        raise ValueError(
                            f"micro-batch epoch {epoch_id} touches live "
                            f"partition(s) {sorted(p.path for p in overlap)}; "
                            "strict mode forbids cross-batch partition "
                            "supersession — use mode='append'"
                        )
                    out = batch_df
                    if overlap:
                        # exact directory strings: no partition-type inference,
                        # so a value like '01' cannot round-trip through int 1
                        # and land under a different directory
                        live = read_version(
                            batch_df.sparkSession,
                            table,
                            PartitionedTableVersion(overlap),
                            infer_partition_types=False,
                        )
                        out = batch_df.unionByName(_align(live, batch_df))
                    # the union's partitions == the batch's (overlap ⊆ touched):
                    # hand them over, skipping discovery entirely — a micro-batch
                    # must never pay an O(table-partitions) directory walk
                    versioned_insert_into(
                        out, table, tracker, user_id, message,
                        metastore=metastore, partitions=touched,
                        stats_columns=stats_columns,
                    )
                    if epoch_cache is not None:
                        epoch_cache["latest_epoch"] = epoch_id
                finally:
                    batch_df.unpersist()
                return
            if isinstance(current, SnapshotTableVersion):
                if mode == "strict" and not current.version.is_unversioned:
                    raise ValueError(
                        f"micro-batch epoch {epoch_id} would supersede the live "
                        "snapshot version; strict mode forbids it — use "
                        "mode='append' (cumulative) or 'overwrite_partitions'"
                    )
                if mode == "append" and not current.version.is_unversioned:
                    # snapshot append = cumulative whole-table version
                    live = read_version(batch_df.sparkSession, table, current)
                    out = batch_df.unionByName(_align(live, batch_df))

        # micro-batches are narrow; pre-write distinct scan beats walking the
        # whole table's partition directories (partition_discovery='listing')
        versioned_insert_into(
            out, table, tracker, user_id, message,
            metastore=metastore, partition_discovery="scan",
            stats_columns=stats_columns,
        )
        if epoch_cache is not None:
            epoch_cache["latest_epoch"] = epoch_id
    except BaseException:
        # a failure between the tracker commit and the cache update (e.g. a
        # post-commit metastore sync error) would leave the cached epoch
        # stale; a replay of this epoch would then pass the guard and
        # double its rows — drop the cache so the next attempt re-derives
        # the latest committed epoch from the log itself
        if epoch_cache is not None:
            epoch_cache.pop("latest_epoch", None)
        raise


def versioned_stream_sink(
    stream_df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    checkpoint_dir: str,
    metastore=None,
    message_prefix: str = "stream",
    mode: str = "append",
    stats_columns=None,
):
    """Configure a ``DataStreamWriter`` that lands every micro-batch as a
    versioned commit.  Caller starts it (and picks the trigger)::

        q = versioned_stream_sink(df, table, tracker, "etl",
                                  "/ckpt/events").trigger(availableNow=True).start()
        q.awaitTermination()

    See the module docstring for the crucial ``mode`` semantics
    (default ``"append"`` accumulates rows per partition across batches;
    ``"overwrite_partitions"`` is per-batch supersession and requires
    whole-partitions-per-batch arrival; ``"strict"`` errors on overlap).
    ``stats_columns`` forwards to ``versioned_insert_into`` so every
    micro-batch commit also records data-skipping sidecars (spark/stats.py).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    # per-query epoch cache: the replay guard's full log read happens only
    # on the first micro-batch after each (re)start
    epoch_cache: dict = {}

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        commit_stream_batch(
            batch_df,
            epoch_id,
            table,
            tracker,
            user_id,
            metastore=metastore,
            message_prefix=message_prefix,
            mode=mode,
            epoch_cache=epoch_cache,
            stats_columns=stats_columns,
        )

    return stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
