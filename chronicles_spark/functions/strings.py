"""Column-expression versions of the path/version/partition string algebra.

These are the distributed (JVM-side, codegen-friendly) equivalents of
``core.paths`` / ``core.model`` parsing — used when version/partition
metadata arrives as *columns* (e.g. parsing millions of metastore location
strings, reference M1: spark/.../SparkHiveMetastore.scala:21-43, or
scanning a log with ``spark.read.json``). Pure ``pyspark.sql.functions``
compositions — no Python UDFs.

Regex note: patterns avoid backslash classes so the same pattern strings
work in ANSI-mode SQL literals and DuckDB (`[0-9]` not `\\d`).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# reference label shape (core/.../Version.scala:42-44), backslash-free
VERSION_LABEL_RE = (
    "([0-9]{8}-[0-9]{6})[.]([0-9]{9})-"
    "([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})"
)


def version_of_path(path: Column) -> Column:
    """Version label from a location's last segment, '' if unversioned
    (≙ core.paths.parse_version; reference VersionPaths.scala:30-41)."""
    return F.regexp_extract(path, "_version=([^/]+)$", 1)


def base_path_of(path: Column) -> Column:
    """Strip a trailing /_version=<label> (≙ core.paths.versioned_to_base_path;
    reference VersionPaths.scala:46-57)."""
    return F.regexp_replace(path, "/_version=[^/]+$", "")


def partition_of_path(path: Column, partition_column: str) -> Column:
    """Extract one ``col=value`` segment from a path."""
    return F.regexp_extract(path, "(" + partition_column + "=[^/]+)", 1)


def hive_partition_expr(*column_value_cols: tuple[str, Column]) -> Column:
    """Render ``(k1='v1',k2='v2')`` (≙ Partition.hive_expr; reference M10:
    spark/.../SparkHiveMetastore.scala:163-171)."""
    pieces = []
    for i, (name, col) in enumerate(column_value_cols):
        prefix = "(" if i == 0 else ","
        pieces.append(F.concat(F.lit(prefix + name + "='"), col, F.lit("'")))
    return F.concat(*pieces, F.lit(")"))


def version_label_parts(label: Column) -> tuple[Column, Column, Column]:
    """(timestamp-part, nanos-part, uuid-part) of a version label
    (≙ core.version.parse_version; reference Version.scala:49-65)."""
    pat = "^" + VERSION_LABEL_RE + "$"
    return (
        F.regexp_extract(label, pat, 1),
        F.regexp_extract(label, pat, 2),
        F.regexp_extract(label, pat, 3),
    )
