"""Cross-table group commits (tracker.commit_group +
versioned_insert_group) — the multi-table transaction surface, run
against every tracker backend per the shared behaviour-suite pattern.
"""

import pytest

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
from chronicles_spark.trackers import (
    FileBackedVersionTracker,
    InMemoryVersionTracker,
    SqliteVersionTracker,
    UnknownTableError,
)

TA = TableName("db", "docs")
TB = TableName("db", "embs")
P1 = Partition.of(("d", "1"))


@pytest.fixture(params=["memory", "files", "files-cas", "sqlite"])
def tracker(request, tmp_path):
    if request.param == "memory":
        return InMemoryVersionTracker()
    if request.param == "files":
        return FileBackedVersionTracker(str(tmp_path / "log"))
    if request.param == "files-cas":
        # cross-table group commits over the conditional-put protocol
        return FileBackedVersionTracker(str(tmp_path / "log"), use_cas=True)
    return SqliteVersionTracker(str(tmp_path / "log.db"))


def _group(msg="group"):
    v1, v2 = generate_version(), generate_version()
    return {
        TA: TableUpdate(
            TableUpdateMetadata.new("u", msg), (AddPartitionVersion(P1, v1),)
        ),
        TB: TableUpdate(
            TableUpdateMetadata.new("u", msg), (AddPartitionVersion(P1, v2),)
        ),
    }, v1, v2


def test_commit_group_lands_on_all_tables(tracker):
    tracker.init_table(TA, is_snapshot=False, user_id="u")
    tracker.init_table(TB, is_snapshot=False, user_id="u")
    group, v1, v2 = _group()
    tracker.commit_group(group)
    assert tracker.current_version(TA).partition_versions == {P1: v1}
    assert tracker.current_version(TB).partition_versions == {P1: v2}
    # head pointers advanced to the group's commits
    assert (
        tracker.table_state(TA).current_version
        == group[TA].metadata.commit_id
    )


def test_commit_group_unknown_table_fails_whole_group(tracker):
    tracker.init_table(TA, is_snapshot=False, user_id="u")
    group, _v1, _v2 = _group()  # TB never initialised
    before = len(tracker.updates(TA))
    with pytest.raises(UnknownTableError):
        tracker.commit_group(group)
    # nothing landed anywhere — validation precedes any append
    assert len(tracker.updates(TA)) == before


def test_sqlite_group_is_atomic_on_midway_failure(tmp_path):
    """sqlite: a failure inside the group txn rolls back EVERY table's
    append — readers can never observe half a group."""
    tracker = SqliteVersionTracker(str(tmp_path / "log.db"))
    tracker.init_table(TA, is_snapshot=False, user_id="u")
    tracker.init_table(TB, is_snapshot=False, user_id="u")
    good, _v1, _v2 = _group()
    # second table's update reuses the FIRST's commit id → UNIQUE violation
    # fires after TA's rows are already inserted in the txn
    bad = {
        TA: good[TA],
        TB: TableUpdate(good[TA].metadata, good[TB].operations),
    }
    import sqlite3

    before_a = len(tracker.updates(TA))
    with pytest.raises(sqlite3.IntegrityError):
        tracker.commit_group(bad)
    assert len(tracker.updates(TA)) == before_a  # TA's insert rolled back
    assert tracker.current_version(TA).partition_versions == {}


def test_versioned_insert_group_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, versioned_insert_group

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    docs = TableDefinition(
        TableName("db", "docs"), str(tmp_path / "docs"), PartitionSchema(("d",))
    )
    embs = TableDefinition(
        TableName("db", "embs"), str(tmp_path / "embs"), PartitionSchema(())
    )
    tracker.init_table(docs.name, is_snapshot=False, user_id="u")
    tracker.init_table(embs.name, is_snapshot=True, user_id="u")
    ddf = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    edf = spark.range(4).select(F.col("id"), (F.col("id") * 2).alias("v"))

    states = versioned_insert_group(
        [(ddf, docs), (edf, embs)], tracker, "u", "batch 7"
    )
    assert set(states) == {docs.name, embs.name}
    assert read_current(spark, docs, tracker).count() == 4
    assert read_current(spark, embs, tracker).count() == 4
    # both tables carry the SAME commit message = one logical batch
    assert tracker.updates(docs.name)[0].message == "batch 7"
    assert tracker.updates(embs.name)[0].message == "batch 7"

    # unknown table fails the whole group before any bytes are written
    ghost = TableDefinition(
        TableName("db", "ghost"), str(tmp_path / "ghost"), PartitionSchema(("d",))
    )
    with pytest.raises(UnknownTableError):
        versioned_insert_group([(ddf, docs), (ddf, ghost)], tracker, "u", "x")
    import os

    assert not os.path.exists(ghost.location)


def test_inmemory_group_commit_is_atomic_under_threads():
    """Concurrent readers never observe one table of a group advanced
    without the other; concurrent groups never interleave (the per-table
    serialization is held across the whole loop, round-4 review finding)."""
    import threading

    tracker = InMemoryVersionTracker()
    tracker.init_table(TA, is_snapshot=False, user_id="u")
    tracker.init_table(TB, is_snapshot=False, user_id="u")

    N = 50
    torn = []
    stop = threading.Event()

    def writer():
        for i in range(N):
            group, _v1, _v2 = _group(msg=f"g{i}")
            tracker.commit_group(group)
        stop.set()

    def _idx(m):
        return int(m[1:]) if m.startswith("g") else -1

    def reader():
        while not stop.is_set():
            # TA ("db.docs") appends FIRST in sorted group order, so a torn
            # group is observable only as TA ahead of TB.  The two reads
            # are separate lock acquisitions, so TB may legitimately be
            # AHEAD of TA (a full group landed between the reads) — only
            # the torn direction is a failure.
            ma = tracker.updates(TA)[0].message
            mb = tracker.updates(TB)[0].message
            if _idx(ma) > _idx(mb):
                torn.append((ma, mb))

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert torn == [], f"observed torn groups: {torn[:3]}"


def test_group_write_syncs_metastore(spark, tmp_path):
    """versioned_insert_group's metastore path: after the group publish,
    each table's catalog pointers match the new live state."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import versioned_insert_group
    from chronicles_spark.spark.metastore import InMemoryMetastore

    tracker = InMemoryVersionTracker()
    ms = InMemoryMetastore()
    docs = TableDefinition(
        TableName("db", "docs"), str(tmp_path / "docs"), PartitionSchema(("d",))
    )
    embs = TableDefinition(
        TableName("db", "embs"), str(tmp_path / "embs"), PartitionSchema(())
    )
    for t in (docs, embs):
        tracker.init_table(t.name, is_snapshot=t.is_snapshot, user_id="u")
        ms.create_table(t)
    ddf = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    edf = spark.range(3).select(F.col("id"))

    states = versioned_insert_group(
        [(ddf, docs), (edf, embs)], tracker, "u", "sync", metastore=ms
    )
    assert ms.current_version(docs) == states[docs.name]
    assert ms.current_version(embs) == states[embs.name]


def test_versioned_insert_group_optimistic(spark, tmp_path):
    """Round 7: the group WRITE surface exposes expected_heads — a
    conflict on one table lands neither table's commit, and a disjoint
    interim commit auto-merges."""
    import pytest
    from pyspark.sql import functions as F

    from chronicles_spark.core.model import (
        Partition, PartitionSchema, TableDefinition, TableName,
    )
    from chronicles_spark.core.ops import (
        AddPartitionVersion, TableUpdate, TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.writer import versioned_insert_group
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.trackers.base import CommitConflictError

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    ta = TableDefinition(
        TableName("g", "a"), str(tmp_path / "a"), PartitionSchema(("p",))
    )
    tb = TableDefinition(
        TableName("g", "b"), str(tmp_path / "b"), PartitionSchema(("p",))
    )
    for t in (ta, tb):
        tracker.init_table(t.name, is_snapshot=False, user_id="t")
    df = spark.createDataFrame([(1, "x")], "v long, p string")
    heads = {
        t.name: tracker.table_state(t.name).current_version for t in (ta, tb)
    }
    # interim commit on b touching partition p=x → overlap → conflict
    tracker.commit(
        tb.name,
        TableUpdate(
            TableUpdateMetadata.new("r", "racer"),
            (AddPartitionVersion(Partition.of(("p", "x")), generate_version()),),
        ),
    )
    head_a_before = tracker.table_state(ta.name).current_version
    with pytest.raises(CommitConflictError):
        versioned_insert_group(
            [(df, ta), (df, tb)], tracker, "t", "grp", expected_heads=heads
        )
    assert tracker.table_state(ta.name).current_version == head_a_before

    # disjoint interim (p=y vs our p=x write on a only?) — write p=z on
    # both; the racer touched p=x on b → disjoint → merges
    df2 = spark.createDataFrame([(1, "z")], "v long, p string")
    out = versioned_insert_group(
        [(df2, ta), (df2, tb)], tracker, "t", "grp2", expected_heads=heads
    )
    assert set(out) == {ta.name, tb.name}
