"""Streaming aggregations: watermarked tumbling windows, session windows,
and a custom stateful operator.

``windowed_counts`` and ``sessionize`` are BATCH/STREAM DUAL-MODE: the same
declarative plan runs over a static DataFrame (deterministic, DuckDB
oracle-checkable — how the driver's correctness gate exercises them) and
over a ``readStream`` DataFrame (watermark bounds state, late rows beyond
the watermark are dropped).  That duality is the point of expressing them
with built-in window functions instead of custom state.

``running_user_totals_stream`` is the genuinely-stateful case built on
``applyInPandasWithState`` — streaming-only by construction (exercised in
tests with an ``availableNow`` file-source run; no SQL oracle exists for
arbitrary state machines, which is exactly when this API is the right
tool).
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Streaming: watermark bounds the state store — windows older than the
    watermark are finalized and evicted, so state is O(active windows), not
    O(stream length).  Batch: the watermark call is a no-op and the result
    is deterministic (epoch-aligned window starts, same rule DuckDB's
    epoch arithmetic reproduces)."""
    src = events
    if events.isStreaming:
        # event-time requires TIMESTAMP (LTZ); sources normalized to NTZ
        # cast losslessly under the UTC session timezone
        src = events.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(ts_col, window).alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into one
    session (``F.session_window`` — Spark's native gaps-and-islands).

    Streaming: sessions finalize when the watermark passes session end.
    Batch: equivalent to the classic lag/cumsum islands computation, which
    is the DuckDB oracle.  One shuffle on (user, session) — the session
    merge happens inside the aggregation, no self-join."""
    src = events
    if events.isStreaming:
        src = events.withColumn(
            ts_col, F.col(ts_col).cast("timestamp")
        ).withWatermark(ts_col, gap)
    return src.groupBy(
        F.session_window(ts_col, gap).alias("s"), F.col(user_col)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).select(
        F.col(user_col),
        F.col("s.start").alias("session_start"),
        "n_events",
        "sum_value",
    )


def stream_dedup_exact(
    events: DataFrame,
    id_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact in-flight dedup — the first stage of any streaming
    training-data ingest.

    Streaming: ``dropDuplicatesWithinWatermark`` keys the state store by
    ``id_cols`` and evicts entries once the watermark passes, so state is
    bounded by the dedup window, not the stream length (plain
    ``dropDuplicates`` on a stream grows state forever).  Batch: ordinary
    ``dropDuplicates`` — deterministic when duplicate rows are bit-equal
    (the exact-dup case this operator exists for)."""
    if events.isStreaming:
        return (
            events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(list(id_cols))
        )
    return events.dropDuplicates(list(id_cols))


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``applyInPandasWithState`` — the custom
    stateful operator shape: state lives in the state store partitioned by
    the group key, each micro-batch updates it with vectorized pandas ops,
    and the operator emits the updated running value per user per batch.

    Use when the update rule can't be expressed as a SQL aggregate (decay,
    conditional resets, model state, ...); for plain running sums prefer
    the windowed/sessionized built-ins above."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
