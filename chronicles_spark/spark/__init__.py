"""Spark-facing surface: versioned writes, current-view reads, time travel."""

from .writer import partition_values, versioned_insert_into
from .reader import read_current, read_version, live_paths

__all__ = [
    "partition_values",
    "versioned_insert_into",
    "read_current",
    "read_version",
    "live_paths",
]
