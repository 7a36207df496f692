"""Footer-derived per-version column stats + data-skipping reads
(chronicles_spark/spark/stats.py) — the Delta/Iceberg-style file-statistics
layer on the versioned-directory model.  Pruning must be conservative:
skip only what the recorded [min, max] PROVES empty."""

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import read_current, versioned_insert_into
from chronicles_spark.spark.stats import (
    STATS_FILE,
    dir_column_stats,
    prune_paths_by_stats,
)
from chronicles_spark.trackers import FileBackedVersionTracker


@pytest.fixture()
def stats_table(spark, tmp_path):
    """Three date partitions with DISJOINT id ranges: d1→[0,99],
    d2→[100,199], d3→[200,299]."""
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("s", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    rows = [
        Row(id=i + 100 * p, word=f"w{i + 100 * p:04d}", d=f"2020-01-0{p + 1}")
        for p in range(3)
        for i in range(100)
    ]
    versioned_insert_into(
        spark.createDataFrame(rows), table, tracker, "t", "v1", stats_columns="*"
    )
    return table, tracker


def _version_dirs(table):
    out = []
    for part in sorted(os.listdir(table.location)):
        pdir = os.path.join(table.location, part)
        if not os.path.isdir(pdir):
            continue
        out += [
            os.path.join(pdir, v) for v in os.listdir(pdir) if v.startswith("_version=")
        ]
    return sorted(out)


def test_sidecars_written_with_correct_minmax(spark, stats_table):
    table, tracker = stats_table
    dirs = _version_dirs(table)
    assert len(dirs) == 3
    mins, maxs = [], []
    for d in dirs:
        sidecar = json.load(open(os.path.join(d, STATS_FILE)))
        st = sidecar["columns"]["id"]
        assert st["row_count"] == 100
        mins.append(st["min"])
        maxs.append(st["max"])
        # string column stats recorded too
        assert sidecar["columns"]["word"]["min"].startswith("w")
    assert sorted(mins) == [0, 100, 200]
    assert sorted(maxs) == [99, 199, 299]


def test_stats_filter_prunes_directories_and_preserves_answers(spark, stats_table):
    table, tracker = stats_table
    full = read_current(spark, table, tracker)
    want = sorted(
        r["id"] for r in full.where(F.col("id") >= 150).collect()
    )

    skipped = read_current(spark, table, tracker, stats_filter={"id": (150, None)})
    # directories d1 ([0,99]) proved empty → only 2 of 3 dirs planned
    full_dirs = {os.path.dirname(f) for f in full.inputFiles()}
    kept_dirs = {os.path.dirname(f) for f in skipped.inputFiles()}
    assert len(full_dirs) == 3 and len(kept_dirs) == 2
    # skipping is a planning optimization — the real predicate still applies
    got = sorted(r["id"] for r in skipped.where(F.col("id") >= 150).collect())
    assert got == want
    # two-sided bound on the string column prunes to one directory
    one = read_current(
        spark, table, tracker, stats_filter={"word": ("w0100", "w0199")}
    )
    assert len({os.path.dirname(f) for f in one.inputFiles()}) == 1


def test_prune_is_conservative_without_sidecars(spark, stats_table, tmp_path):
    table, tracker = stats_table
    # a later write WITHOUT stats supersedes one partition: its new version
    # dir has no sidecar and must always be kept
    versioned_insert_into(
        spark.createDataFrame([Row(id=5000, word="zz", d="2020-01-01")]),
        table,
        tracker,
        "t",
        "no-stats overwrite",
    )
    df = read_current(spark, table, tracker, stats_filter={"id": (0, 10)})
    kept_dirs = {os.path.dirname(f) for f in df.inputFiles()}
    # d1's new (statless) dir kept despite id=5000; d2/d3 pruned by stats
    assert len(kept_dirs) == 1
    assert df.count() == 1 and df.collect()[0]["id"] == 5000


def test_all_pruned_returns_empty_with_schema(spark, stats_table):
    table, tracker = stats_table
    df = read_current(spark, table, tracker, stats_filter={"id": (10_000, None)})
    assert df.count() == 0
    assert set(df.columns) == {"id", "word", "d"}


def test_distributed_prune_matches_driver_prune(spark, stats_table, monkeypatch):
    import chronicles_spark.spark.stats as stats_mod

    table, tracker = stats_table
    dirs = _version_dirs(table)
    driver = prune_paths_by_stats(spark, dirs, {"id": (150, None)}, table.location)
    monkeypatch.setattr(stats_mod, "DISTRIBUTE_THRESHOLD", 0)
    dist = prune_paths_by_stats(spark, dirs, {"id": (150, None)}, table.location)
    assert sorted(driver) == sorted(dist) and len(dist) == 2


def test_bad_bound_shape_raises(spark, stats_table):
    table, tracker = stats_table
    with pytest.raises(ValueError, match="inclusive"):
        read_current(spark, table, tracker, stats_filter={"id": 150})


def test_dir_column_stats_snapshot_and_mismatched_bound(spark, tmp_path):
    # snapshot table: one dir; mismatched bound types keep the dir
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("s", "snap"), str(tmp_path / "snap"), PartitionSchema(())
    )
    tracker.init_table(table.name, is_snapshot=True, user_id="t")
    versioned_insert_into(
        spark.createDataFrame([Row(id=1), Row(id=2)]),
        table,
        tracker,
        "t",
        "v1",
        stats_columns=["id"],
    )
    [d] = [
        os.path.join(table.location, v)
        for v in os.listdir(table.location)
        if v.startswith("_version=")
    ]
    st = dir_column_stats(d)
    assert st["id"]["min"] == 1 and st["id"]["max"] == 2 and st["id"]["row_count"] == 2
    # a string bound against int stats cannot PROVE emptiness → kept
    kept = prune_paths_by_stats(spark, [d], {"id": ("a", "b")}, table.location)
    assert kept == [d]
