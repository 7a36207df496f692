"""Per-partition-version column statistics + data-skipping reads.

Beyond reference parity (the reference delegates all data-file concerns to
the engine, docs/concepts.md:91-94); this is the Delta/Iceberg-style file
statistics layer, rebuilt on the versioned-directory model:

* At write time, min/max/null-count/row-count per column are aggregated
  from the PARQUET FOOTERS of the just-written files — zero data scan; a
  footer is a few KB regardless of file size — and stored as a
  ``_chronicles_stats.json`` sidecar INSIDE the ``_version=`` directory.
  The sidecar therefore shares the version's lifecycle exactly: invisible
  until the commit lands, carried through time travel, reclaimed by
  vacuum with its directory, and never mutated (a new version gets a new
  sidecar).
* At read time, a ``stats_filter`` (column → inclusive bounds) prunes
  whole version directories whose recorded [min, max] cannot overlap the
  requested range, BEFORE Spark plans the scan — entire partitions are
  skipped without opening any of their files.  This composes with (and
  goes beyond) partition-column pruning: it skips on DATA columns, e.g.
  an event-time range over an ingest-date-partitioned table.

Pruning is strictly conservative: a missing sidecar, a column with no
recorded stats, or an uncomparable bound keeps the directory.  The caller
still applies the real predicate with ``.where`` — skipping is a planning
optimization, never a row filter.

Scale shape: footer reads and sidecar probes are O(#touched partitions)
metadata operations; both fan out to executors over the FS facade (the
vacuum pattern, ``spark/vacuum.py``) above a small threshold, so a
100k-partition write or read plans without a driver-side FS crawl.
"""

from __future__ import annotations

import json
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

from ..core import paths as vpaths
from ..core.model import (
    Partition,
    PartitionedTableVersion,
    SnapshotTableVersion,
    TableDefinition,
)
from ..core.version import Version

STATS_FILE = "_chronicles_stats.json"

# above this many directories, footer/sidecar work fans out to executors
DISTRIBUTE_THRESHOLD = 64


def _jsonable(v):
    """Footer statistics → JSON-stable scalars.  Non-primitive types
    (timestamps, decimals, bytes) serialize via str()/isoformat — ISO
    strings compare lexicographically in timestamp order, so range
    pruning stays correct for them."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None  # unorderable opaque bytes → no stat
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def dir_column_stats(dir_path: str, fmt: str = "parquet") -> Dict[str, dict]:
    """column → {min, max, null_count, row_count} aggregated over the
    parquet footers of every file in ``dir_path`` (no data read).

    A column whose statistics are absent in ANY row group records
    ``min=max=None`` (unknown — readers must keep the directory)."""
    import pyarrow.dataset as ds

    if fmt != "parquet":
        return {}  # ORC/CSV footers not harvested (v1); no stats → no skip
    dataset = ds.dataset(dir_path, format="parquet")
    out: Dict[str, dict] = {}
    for frag in dataset.get_fragments():
        md = frag.metadata
        for rg in range(md.num_row_groups):
            group = md.row_group(rg)
            for ci in range(group.num_columns):
                col = group.column(ci)
                name = col.path_in_schema
                if "." in name:  # nested leaves can't drive top-level pruning
                    continue
                st = out.setdefault(
                    name,
                    {"min": None, "max": None, "null_count": 0, "row_count": 0,
                     "_complete": True},
                )
                st["row_count"] += group.num_rows
                s = col.statistics
                if s is None or not s.has_min_max:
                    st["_complete"] = False
                    continue
                lo, hi = _jsonable(s.min), _jsonable(s.max)
                if lo is None or hi is None:
                    st["_complete"] = False
                else:
                    st["min"] = lo if st["min"] is None else min(st["min"], lo)
                    st["max"] = hi if st["max"] is None else max(st["max"], hi)
                if s.null_count is not None:
                    st["null_count"] += s.null_count
    for st in out.values():
        if not st.pop("_complete"):
            st["min"] = st["max"] = None
    return out


def _stats_dirs(table: TableDefinition, table_version) -> List[str]:
    if isinstance(table_version, SnapshotTableVersion):
        return [vpaths.path_for(table.location, table_version.version)]
    assert isinstance(table_version, PartitionedTableVersion)
    return [
        vpaths.path_for(p.resolve_path(table.location), v)
        for p, v in sorted(
            table_version.partition_versions.items(), key=lambda kv: kv[0].path
        )
    ]


def write_stats_sidecars(
    spark,
    table: TableDefinition,
    version: Version,
    partitions: Optional[Sequence[Partition]],
    columns: Optional[Sequence[str]] = None,
) -> int:
    """Harvest footer stats for every directory this write created and
    store one sidecar per directory.  ``partitions=None`` means a snapshot
    write (one directory).  ``columns`` restricts the recorded set (default:
    every leaf column present in the footers).  Returns #sidecars written.

    Runs AFTER the data write and BEFORE the commit — a crash in between
    leaves sidecars exactly as invisible as the data files next to them.
    """
    if partitions is None:
        dirs = [vpaths.path_for(table.location, version)]
    else:
        dirs = [
            vpaths.path_for(p.resolve_path(table.location), version)
            for p in partitions
        ]
    if not dirs:
        return 0
    fmt = table.format
    keep = set(columns) if columns is not None else None
    location_url = table.location

    def _harvest(dir_paths) -> int:
        from ..trackers.fs import filesystem_for

        fs, _ = filesystem_for(location_url)
        n = 0
        for d in dir_paths:
            stats = dir_column_stats(d, fmt)
            if keep is not None:
                stats = {c: s for c, s in stats.items() if c in keep}
            fs.write_text(
                fs.join(d, STATS_FILE), json.dumps({"columns": stats}, sort_keys=True)
            )
            n += 1
        return n

    if len(dirs) <= DISTRIBUTE_THRESHOLD:
        return _harvest(dirs)
    sc = spark.sparkContext
    n_slices = max(1, min(len(dirs), sc.defaultParallelism))
    return sum(
        sc.parallelize(dirs, n_slices)
        .mapPartitions(lambda it: [_harvest(list(it))])
        .collect()
    )


def load_sidecar(fs, dir_path: str) -> Optional[dict]:
    """The ``columns`` dict of a directory's stats sidecar, or None when
    absent/unreadable (→ the directory must be kept)."""
    try:
        return json.loads(fs.read_text(fs.join(dir_path, STATS_FILE)))["columns"]
    except (FileNotFoundError, KeyError, ValueError):
        return None


def dir_passes(columns_stats: Optional[dict], bounds: Mapping[str, Tuple]) -> bool:
    """Could a directory with these recorded stats contain a row inside
    every bound?  Pure and conservative: None/unknown stats → True."""
    if columns_stats is None:
        return True
    return all(
        _overlaps(columns_stats.get(c, {}), lo, hi) for c, (lo, hi) in bounds.items()
    )


def _overlaps(st: dict, lo, hi) -> bool:
    """Can [st.min, st.max] intersect [lo, hi]?  Unknown → yes (keep)."""
    smin, smax = st.get("min"), st.get("max")
    if smin is None or smax is None:
        return True
    try:
        if lo is not None and smax < lo:
            return False
        if hi is not None and smin > hi:
            return False
    except TypeError:  # caller's bound type ≠ recorded type → can't prove skip
        return True
    return True


def prune_paths_by_stats(
    spark,
    paths: Sequence[str],
    stats_filter: Mapping[str, Tuple],
    location_url: str,
) -> List[str]:
    """Directories whose sidecar proves NO row can satisfy
    ``stats_filter`` are dropped; everything else (including directories
    with no sidecar) is kept.  ``stats_filter`` maps column → inclusive
    ``(lo, hi)`` bounds, either side None for open."""
    for col, bound in stats_filter.items():
        if not isinstance(bound, (tuple, list)) or len(bound) != 2:
            raise ValueError(
                f"stats_filter[{col!r}] must be an inclusive (lo, hi) pair, "
                f"got {bound!r}"
            )
    flt = {c: (b[0], b[1]) for c, b in stats_filter.items()}

    def _keep(dir_paths) -> List[str]:
        from ..trackers.fs import filesystem_for

        fs, _ = filesystem_for(location_url)
        return [d for d in dir_paths if dir_passes(load_sidecar(fs, d), flt)]

    if len(paths) <= DISTRIBUTE_THRESHOLD:
        return _keep(list(paths))
    sc = spark.sparkContext
    n_slices = max(1, min(len(paths), sc.defaultParallelism))
    kept = (
        sc.parallelize(list(paths), n_slices)
        .mapPartitions(lambda it: _keep(list(it)))
        .collect()
    )
    return sorted(kept)
