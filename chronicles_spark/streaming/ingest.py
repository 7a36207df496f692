"""Streaming ingest into a versioned table: Structured Streaming →
micro-batch commits.

The reference (stettix/chronicles) is batch-only (SURVEY §2.6); this module
is part of the training-data-pipeline extension.  The composition is the
canonical Spark shape for transactional sinks: ``writeStream.foreachBatch``
hands each micro-batch to the exact same ``versioned_insert_into`` path the
batch API uses (spark/.../VersionContext.scala:51-104 parity), so every
micro-batch becomes one commit in the version tracker's log.

Delivery semantics: the streaming checkpoint gives at-least-once batch
delivery; a replayed epoch re-runs ``versioned_insert_into``, which writes
a FRESH ``_version=`` directory for the affected partitions and commits it.
The current view therefore never shows duplicated rows from a replay — the
replayed version simply supersedes the original, the same
overwrite-by-partition idempotence the batch writer has.  Epoch ids are
recorded in the commit message for audit.

At scale: each micro-batch shuffles only its own partitions; the commit is
O(metadata).  Backpressure / trigger sizing is the caller's choice
(``trigger(availableNow=True)`` for catch-up ingest, processing-time
triggers for steady state).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from ..core.model import TableDefinition
from ..spark.writer import versioned_insert_into
from ..trackers.base import VersionTracker


def versioned_stream_sink(
    stream_df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    checkpoint_dir: str,
    metastore=None,
    message_prefix: str = "stream",
):
    """Configure a ``DataStreamWriter`` that lands every micro-batch as a
    versioned commit.  Caller starts it (and picks the trigger)::

        q = versioned_stream_sink(df, table, tracker, "etl",
                                  "/ckpt/events").trigger(availableNow=True).start()
        q.awaitTermination()
    """

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            versioned_insert_into(
                batch_df,
                table,
                tracker,
                user_id,
                f"{message_prefix} epoch {epoch_id}",
                metastore=metastore,
            )

    return stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
