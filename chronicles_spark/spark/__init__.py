"""Spark-facing surface: versioned writes, current-view reads, time travel."""

from .writer import partition_values, versioned_insert_into
from .reader import read_current, read_version, live_paths
from .vacuum import vacuum

__all__ = [
    "partition_values",
    "versioned_insert_into",
    "read_current",
    "read_version",
    "live_paths",
    "vacuum",
]
