"""Spark-facing surface: versioned writes, current-view reads, time travel."""

from .writer import partition_values, versioned_insert_group, versioned_insert_into
from .reader import (
    changed_partitions,
    live_paths,
    read_at_commit,
    read_at_tag,
    read_at_timestamp,
    read_changes,
    read_current,
    read_group,
    read_version,
    restrict_partitions,
)
from .compact import compact_partitions, zorder_column
from .log_reader import UPDATE_JSON_SCHEMA, commit_log_df, export_commit_log
from .manifest import generate_manifest
from .restore import restore_partitions
from .schema_guard import SchemaDriftError, schema_history, stored_schema
from .vacuum import vacuum

__all__ = [
    "partition_values",
    "versioned_insert_into",
    "versioned_insert_group",
    "read_current",
    "read_group",
    "read_version",
    "restrict_partitions",
    "read_at_commit",
    "read_at_tag",
    "read_at_timestamp",
    "read_changes",
    "changed_partitions",
    "live_paths",
    "commit_log_df",
    "export_commit_log",
    "UPDATE_JSON_SCHEMA",
    "compact_partitions",
    "zorder_column",
    "generate_manifest",
    "vacuum",
    "SchemaDriftError",
    "stored_schema",
    "schema_history",
    "restore_partitions",
]
