"""Partition-level restore (spark/restore.py) — git-revert scoped to
partitions, vs checkout's whole-table rewind (VersionedMetastore.scala:71-78).

Pure-metadata tests build the log directly through the tracker (no Spark
jobs needed: restore itself never touches data), plus one end-to-end
write/restore/read flow and the CLI verb.
"""

from datetime import datetime, timezone

import pytest

import chronicles_spark.cli as C
from chronicles_spark.core.model import (
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.spark.restore import restore_partitions
from chronicles_spark.trackers import InMemoryVersionTracker


P1 = Partition.of(("date", "2024-01-01"))
P2 = Partition.of(("date", "2024-01-02"))
P3 = Partition.of(("date", "2024-01-03"))


def _commit(tracker, name, *ops, msg="m"):
    meta = TableUpdateMetadata.new("u", msg, datetime.now(timezone.utc))
    tracker.commit(name, TableUpdate(meta, tuple(ops)))
    return meta.commit_id


def _mk(tmp_path):
    tracker = InMemoryVersionTracker()
    table = TableDefinition(
        TableName("db", "t"), str(tmp_path / "t"), PartitionSchema(("date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    return table, tracker


def test_restore_repoints_only_chosen_partitions(tmp_path):
    table, tracker = _mk(tmp_path)
    v1, v2 = generate_version(), generate_version()
    c1 = _commit(
        tracker, table.name, AddPartitionVersion(P1, v1), AddPartitionVersion(P2, v1)
    )
    _commit(
        tracker, table.name, AddPartitionVersion(P1, v2), AddPartitionVersion(P2, v2)
    )

    state, _ = restore_partitions(
        table, tracker, [P1], "u", "undo p1", at_commit=c1, verify_exists=False
    )
    assert state.partition_versions[P1] == v1  # restored
    assert state.partition_versions[P2] == v2  # untouched
    # history preserved: restore ADDED a commit, nothing rewound
    assert len(tracker.updates(table.name)) == 4


def test_restore_absent_partition_becomes_tombstone(tmp_path):
    table, tracker = _mk(tmp_path)
    v1, v2 = generate_version(), generate_version()
    c1 = _commit(tracker, table.name, AddPartitionVersion(P1, v1))
    _commit(tracker, table.name, AddPartitionVersion(P2, v2))  # P2 born later

    state, _ = restore_partitions(
        table, tracker, [P2], "u", "drop p2", at_commit=c1, verify_exists=False
    )
    # P2 did not exist at c1 — restoring it there means removing it
    assert P2 not in state.partition_versions
    assert state.partition_versions[P1] == v1


def test_restore_noop_when_already_at_target(tmp_path):
    table, tracker = _mk(tmp_path)
    v1 = generate_version()
    c1 = _commit(tracker, table.name, AddPartitionVersion(P1, v1))
    before = len(tracker.updates(table.name))
    state, changes = restore_partitions(
        table, tracker, [P1], "u", "noop", at_commit=c1, verify_exists=False
    )
    assert state.partition_versions[P1] == v1
    assert changes == []
    # no empty commit was appended
    assert len(tracker.updates(table.name)) == before


def test_restore_selector_validation(tmp_path):
    table, tracker = _mk(tmp_path)
    v1 = generate_version()
    c1 = _commit(tracker, table.name, AddPartitionVersion(P1, v1))
    with pytest.raises(ValueError, match="exactly one"):
        restore_partitions(table, tracker, [P1], "u", "m")
    with pytest.raises(ValueError, match="exactly one"):
        restore_partitions(
            table, tracker, [P1], "u", "m", at_commit=c1, at_tag="x"
        )
    with pytest.raises(ValueError, match="no partitions"):
        restore_partitions(table, tracker, [], "u", "m", at_commit=c1)
    snap = TableDefinition(TableName("db", "s"), "loc", PartitionSchema(()))
    with pytest.raises(ValueError, match="snapshot"):
        restore_partitions(snap, tracker, [P1], "u", "m", at_commit=c1)


def test_restore_at_tag_and_timestamp(tmp_path):
    table, tracker = _mk(tmp_path)
    v1, v2 = generate_version(), generate_version()
    c1 = _commit(tracker, table.name, AddPartitionVersion(P1, v1))
    tracker.set_tag(table.name, "good", c1)
    _commit(tracker, table.name, AddPartitionVersion(P1, v2))

    state, _ = restore_partitions(
        table, tracker, [P1], "u", "to tag", at_tag="good", verify_exists=False
    )
    assert state.partition_versions[P1] == v1

    # roll forward again via timestamp far in the future = latest commit
    state, _ = restore_partitions(
        table, tracker, [P1], "u", "fwd", at_timestamp="2999-01-01T00:00:00",
        verify_exists=False,
    )
    # latest commit before 2999 is the restore-to-tag commit... which set v1
    assert state.partition_versions[P1] == v1


def test_restore_verify_exists_refuses_missing_dirs(tmp_path):
    table, tracker = _mk(tmp_path)
    v1, v2 = generate_version(), generate_version()
    c1 = _commit(tracker, table.name, AddPartitionVersion(P1, v1))
    _commit(tracker, table.name, AddPartitionVersion(P1, v2))
    # v1's directory never existed on disk (or was vacuumed)
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_partitions(table, tracker, [P1], "u", "m", at_commit=c1)
    # creating the directory satisfies the probe
    d = tmp_path / "t" / "date=2024-01-01" / f"_version={v1.label}"
    d.mkdir(parents=True)
    state, _ = restore_partitions(table, tracker, [P1], "u", "m", at_commit=c1)
    assert state.partition_versions[P1] == v1


def test_restore_end_to_end_with_spark(spark, tmp_path):
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, versioned_insert_into
    from chronicles_spark.trackers import FileBackedVersionTracker

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(df, table, tracker, "u", "w1")
    good_head = tracker.table_state(table.name).current_version
    # bad overwrite of partition d=1 only
    bad = spark.range(100, 103).select(
        F.col("id"), F.lit("1").alias("d")
    )
    versioned_insert_into(bad, table, tracker, "u", "bad write")
    assert read_current(spark, table, tracker).count() == 6  # 3 + 3 bad rows

    restore_partitions(
        table, tracker, [Partition.of(("d", "1"))], "u", "undo bad",
        at_commit=good_head,
    )
    got = read_current(spark, table, tracker)
    assert got.count() == 6
    assert got.where(F.col("id") >= 100).count() == 0  # bad rows gone
    assert got.where(F.col("d") == "0").count() == 3  # untouched partition


def test_cli_restore_verb(tmp_path):
    from tests.test_cli import make_client

    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "w1"],
          client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-02", "--message", "w2"],
          client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "w3"],
          client, console, "u")
    C.run(["log", "db.t"], client, console, "u")
    lines = [l for l in console.out if "\t" in l]
    w1_commit = [l.split("\t")[0] for l in lines if l.endswith("w1")][0]

    code = C.run(
        ["restore", "db.t", "date=2024-01-01", "--commit", w1_commit,
         "--message", "undo w3"],
        client, console, "u",
    )
    assert code == 0
    assert "Restored 1 partition" in console.out[-1]
    # selector validation surfaces as a CLI error
    code = C.run(
        ["restore", "db.t", "date=2024-01-01", "--message", "m"],
        client, console, "u",
    )
    assert code == 1
