from .ingest import versioned_stream_sink
from .aggregates import windowed_counts, sessionize, running_user_totals_stream

__all__ = [
    "versioned_stream_sink",
    "windowed_counts",
    "sessionize",
    "running_user_totals_stream",
]
