from .ingest import versioned_stream_sink
from .aggregates import (
    running_user_totals_stream,
    sessionize,
    stream_dedup_exact,
    windowed_counts,
)

__all__ = [
    "versioned_stream_sink",
    "windowed_counts",
    "sessionize",
    "stream_dedup_exact",
    "running_user_totals_stream",
]
