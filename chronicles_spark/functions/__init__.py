from .strings import (
    base_path_of,
    hive_partition_expr,
    partition_of_path,
    version_label_parts,
    version_of_path,
)

__all__ = [
    "version_of_path",
    "base_path_of",
    "partition_of_path",
    "hive_partition_expr",
    "version_label_parts",
]
