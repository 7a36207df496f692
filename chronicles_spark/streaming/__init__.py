from .ingest import commit_stream_batch, versioned_stream_sink
from .aggregates import (
    running_user_totals_stream,
    sessionize,
    stream_dedup_exact,
    windowed_counts,
)

__all__ = [
    "versioned_stream_sink",
    "commit_stream_batch",
    "windowed_counts",
    "sessionize",
    "stream_dedup_exact",
    "running_user_totals_stream",
]
