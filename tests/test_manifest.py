"""Symlink-format manifest export (spark/manifest.py): the current live
file set as plain-text manifests an external engine
(Presto/Trino/Athena/Hive SymlinkTextInputFormat) can read without any
chronicles code or metastore sync."""

import os

import pytest

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import (
    generate_manifest,
    read_current,
    vacuum,
    versioned_insert_into,
)
from chronicles_spark.trackers import InMemoryVersionTracker


def _mk(spark, tmp_path, name="man", parts=("date",)):
    table = TableDefinition(
        TableName("db", name), str(tmp_path / name), PartitionSchema(tuple(parts))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=not parts, user_id="a")
    return table, tracker


def _manifest_lines(path):
    with open(path) as f:
        return [ln for ln in f.read().splitlines() if ln]


def test_manifest_lists_exactly_the_live_files(spark, tmp_path):
    table, tracker = _mk(spark, tmp_path)
    df1 = spark.createDataFrame(
        [("u1", "2019-01-01"), ("u2", "2019-01-02")], ["user", "date"]
    )
    versioned_insert_into(df1, table, tracker, "a", "v1", stats_columns="*")
    # supersede d1 so the manifest must pick the NEW version only
    df2 = spark.createDataFrame([("u9", "2019-01-01")], ["user", "date"])
    versioned_insert_into(df2, table, tracker, "a", "v2")

    written = generate_manifest(table, tracker)
    assert [os.path.relpath(p, table.location) for p in written] == [
        "_chronicles_manifest/date=2019-01-01/manifest",
        "_chronicles_manifest/date=2019-01-02/manifest",
    ]

    all_files = [f for p in written for f in _manifest_lines(p)]
    assert all_files, "manifests must list data files"
    for f in all_files:
        assert os.path.isfile(f)
        assert "_version=" in f and f.endswith(".parquet")
        assert "_chronicles_stats" not in f  # sidecars excluded

    # an engine that just reads the manifest files sees the live view
    manifest_df = spark.read.parquet(*all_files)
    live = read_current(spark, table, tracker).select("user")
    assert {r["user"] for r in manifest_df.collect()} == {
        r["user"] for r in live.collect()
    } == {"u9", "u2"}


def test_manifest_regeneration_drops_stale_partitions(spark, tmp_path):
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import RemovePartition, TableUpdate, TableUpdateMetadata

    table, tracker = _mk(spark, tmp_path, "man2")
    df1 = spark.createDataFrame(
        [("u1", "2019-01-01"), ("u2", "2019-01-02")], ["user", "date"]
    )
    versioned_insert_into(df1, table, tracker, "a", "v1")
    first = generate_manifest(table, tracker)
    assert len(first) == 2

    tracker.commit(
        table.name,
        TableUpdate(
            TableUpdateMetadata.new("a", "drop d2"),
            (RemovePartition(Partition.parse("date=2019-01-02")),),
        ),
    )
    second = generate_manifest(table, tracker)
    assert len(second) == 1 and "date=2019-01-01" in second[0]
    # full regeneration: the stale d2 manifest is GONE, not left behind
    assert not os.path.exists(
        os.path.join(table.location, "_chronicles_manifest", "date=2019-01-02")
    )


def test_manifest_snapshot_table(spark, tmp_path):
    table, tracker = _mk(spark, tmp_path, "snap", parts=())
    versioned_insert_into(
        spark.createDataFrame([(1, "a")], ["id", "v"]), table, tracker, "a", "v1"
    )
    written = generate_manifest(table, tracker)
    assert [os.path.relpath(p, table.location) for p in written] == [
        "_chronicles_manifest/manifest"
    ]
    files = _manifest_lines(written[0])
    assert files and all(os.path.isfile(f) for f in files)
    assert {r["id"] for r in spark.read.parquet(*files).collect()} == {1}


def test_manifest_distributed_matches_driver(spark, tmp_path):
    table, tracker = _mk(spark, tmp_path, "man3")
    rows = [(f"u{i}", f"2019-01-{(i % 5) + 1:02d}") for i in range(20)]
    versioned_insert_into(
        spark.createDataFrame(rows, ["user", "date"]), table, tracker, "a", "v1"
    )
    driver = generate_manifest(table, tracker)
    contents = {p: _manifest_lines(p) for p in driver}
    dist = generate_manifest(table, tracker, distributed=True, spark=spark)
    assert dist == driver
    assert {p: _manifest_lines(p) for p in dist} == contents


def test_manifest_invisible_to_data_reads_and_vacuum(spark, tmp_path):
    """The underscore-prefixed manifest root must not disturb normal reads,
    vacuum, or the next versioned write."""
    table, tracker = _mk(spark, tmp_path, "man4")
    df1 = spark.createDataFrame([("u1", "2019-01-01")], ["user", "date"])
    versioned_insert_into(df1, table, tracker, "a", "v1")
    generate_manifest(table, tracker)

    versioned_insert_into(
        spark.createDataFrame([("u2", "2019-01-01")], ["user", "date"]),
        table, tracker, "a", "v2",
    )
    assert {r["user"] for r in read_current(spark, table, tracker).collect()} == {"u2"}
    removed = vacuum(table, tracker, keep_last=1, sweep_orphans=True)
    assert len(removed) == 1 and "_chronicles_manifest" not in removed[0]


def test_manifest_incremental_touches_only_changed_partitions(spark, tmp_path):
    """incremental=True is O(changed partitions): rewrites exactly the
    added/overwritten manifests, prunes removed ones, no-ops at head, and
    falls back to a full rebuild when the pointer is missing/foreign."""
    import json

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import RemovePartition, TableUpdate, TableUpdateMetadata
    from chronicles_spark.spark.manifest import MANIFEST_DIR, POINTER_FILE

    table, tracker = _mk(spark, tmp_path, "inc")
    df1 = spark.createDataFrame(
        [("u1", "2019-01-01"), ("u2", "2019-01-02"), ("u3", "2019-01-03")],
        ["user", "date"],
    )
    versioned_insert_into(df1, table, tracker, "a", "v1")
    full = generate_manifest(table, tracker, incremental=True)  # no pointer → full
    assert len(full) == 3
    ptr = os.path.join(table.location, MANIFEST_DIR, POINTER_FILE)
    assert json.load(open(ptr))["commit_id"] == tracker.table_state(
        table.name
    ).current_version

    # at head: nothing to do
    assert generate_manifest(table, tracker, incremental=True) == []

    # overwrite d1 + add d4 → exactly two manifests rewritten
    df2 = spark.createDataFrame(
        [("u9", "2019-01-01"), ("u4", "2019-01-04")], ["user", "date"]
    )
    versioned_insert_into(df2, table, tracker, "a", "v2")
    snap_before = {
        p: _manifest_lines(p) for p in full if "date=2019-01-02" in p
    }
    written = generate_manifest(table, tracker, incremental=True)
    assert sorted(os.path.relpath(p, table.location) for p in written) == [
        f"{MANIFEST_DIR}/date=2019-01-01/manifest",
        f"{MANIFEST_DIR}/date=2019-01-04/manifest",
    ]
    for p, lines in snap_before.items():  # untouched partition: not rewritten
        assert _manifest_lines(p) == lines
    # the rewritten d1 manifest points at the NEW live version's files
    d1 = os.path.join(table.location, MANIFEST_DIR, "date=2019-01-01", "manifest")
    assert all(os.path.isfile(f) for f in _manifest_lines(d1))
    live_d1 = {
        r["user"]
        for r in spark.read.parquet(*_manifest_lines(d1)).collect()
    }
    assert live_d1 == {"u9"}

    # remove-only commit → incremental prunes just that subtree
    tracker.commit(
        table.name,
        TableUpdate(
            TableUpdateMetadata.new("a", "drop d3"),
            (RemovePartition(Partition.parse("date=2019-01-03")),),
        ),
    )
    assert generate_manifest(table, tracker, incremental=True) == []
    assert not os.path.exists(
        os.path.join(table.location, MANIFEST_DIR, "date=2019-01-03")
    )

    # foreign/corrupt pointer → full rebuild, not an error
    with open(ptr, "w") as f:
        json.dump({"commit_id": "not-a-known-commit"}, f)
    rebuilt = generate_manifest(table, tracker, incremental=True)
    assert len(rebuilt) == 3  # d1, d2, d4 live


def test_manifest_cli_verb(tmp_path):
    """CLI: manifest verb parses and exports over real directories."""
    import chronicles_spark.cli as C
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import InMemoryVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    _, action = C.parse_action(
        ["manifest", "db.t", "--location", "/lake/t", "--incremental"]
    )
    assert action == C.ManifestAction(TableName("db", "t"), "/lake/t", True)

    console = C.CapturingConsole()
    tracker = InMemoryVersionTracker()
    client = C.CliClient(VersionedMetastore(tracker, C.StubMetastore()), console)
    t = TableName("db", "mf")
    tracker.init_table(t, is_snapshot=False, user_id="u")
    p = Partition.parse("date=2019-01-01")
    v = generate_version()
    tracker.commit(
        t, TableUpdate(TableUpdateMetadata.new("u", "w"), (AddPartitionVersion(p, v),))
    )
    loc = tmp_path / "mf"
    d = loc / "date=2019-01-01" / f"_version={v.label}"
    d.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"x")

    rc = C.run(["manifest", "db.mf", "--location", str(loc)], client, console, "u")
    assert rc == 0 and "Wrote 1 manifest file" in console.out[-1]
    manifest = loc / "_chronicles_manifest" / "date=2019-01-01" / "manifest"
    assert manifest.read_text().strip() == str(d / "part-0.parquet")
