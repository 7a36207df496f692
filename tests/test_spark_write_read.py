"""End-to-end acceptance tests on a real SparkSession — the rebuild of the
reference's acceptance suite (DatePartitionedTableSpec.scala:40-152,
MultiPartitionTableSpec.scala:22-122, SnapshotTableSpec.scala:33-104):
write → read → overwrite-partition → inspect on-disk ``_version=`` dirs →
rollback → roll-forward."""

import os

import pytest
from pyspark.sql import Row, functions as F

from chronicles_spark.core.model import (
    FileFormat,
    PartitionSchema,
    PartitionedTableVersion,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.spark import read_current, versioned_insert_into
from chronicles_spark.spark.reader import read_at_commit
from chronicles_spark.spark.metastore import InMemoryMetastore
from chronicles_spark.trackers import FileBackedVersionTracker


@pytest.fixture()
def tracker(tmp_path):
    return FileBackedVersionTracker(str(tmp_path / "_log"))


def _pageview_table(tmp_path):
    return TableDefinition(
        name=TableName("chronicles_test", "pageview"),
        location=str(tmp_path / "pageview"),
        partition_schema=PartitionSchema(("date",)),
        format=FileFormat.PARQUET,
    )


def _pageviews(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, path=p, date=d) for i, p, d in rows]
    )


def test_date_partitioned_lifecycle(spark, tmp_path, tracker):
    """DatePartitionedTableSpec.scala:40-152 condensed."""
    table = _pageview_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="alice")

    day1 = [("u1", "a", "2019-03-13"), ("u2", "b", "2019-03-13")]
    day2 = [("u3", "c", "2019-03-14")]
    tv1, changes1 = versioned_insert_into(
        _pageviews(spark, day1 + day2), table, tracker, "alice", "initial load"
    )
    assert len(tv1.partition_versions) == 2
    assert len(changes1) == 2  # two AddPartition

    view = read_current(spark, table, tracker)
    assert view.count() == 3
    assert "_version" not in view.columns
    assert sorted(view.columns) == ["date", "id", "path"]

    # overwrite day 2 (reprocess)
    day2_fixed = [("u3", "c-fixed", "2019-03-14"), ("u4", "d", "2019-03-14")]
    commit_before = tracker.table_state(table.name).current_version
    tv2, changes2 = versioned_insert_into(
        _pageviews(spark, day2_fixed), table, tracker, "alice", "reprocess day2"
    )
    assert len(changes2) == 1  # one UpdatePartitionVersion
    view2 = read_current(spark, table, tracker)
    assert view2.count() == 4
    assert view2.where(F.col("path") == "c").count() == 0  # old day2 hidden
    assert view2.where(F.col("path") == "c-fixed").count() == 1

    # both versions of day2 exist on disk, side by side (immutability)
    day2_dir = os.path.join(table.location, "date=2019-03-14")
    versions_on_disk = [d for d in os.listdir(day2_dir) if d.startswith("_version=")]
    assert len(versions_on_disk) == 2

    # time-travel read without moving head
    old = read_at_commit(spark, table, tracker, commit_before)
    assert old.count() == 3
    assert old.where(F.col("path") == "c").count() == 1

    # rollback (move head) then read
    tracker.set_current_version(table.name, commit_before)
    assert read_current(spark, table, tracker).count() == 3
    # roll forward
    latest = tracker.updates(table.name)[0].commit_id
    # updates() is most-recent-first but head was moved — latest commit is
    # still the reprocess commit in the log
    tracker.set_current_version(table.name, latest)
    assert read_current(spark, table, tracker).count() == 4


def test_partition_filter_prunes(spark, tmp_path, tracker):
    """W7: filters on partition columns must prune directories
    (DatePartitionedTableSpec.scala:95-105)."""
    table = _pageview_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="alice")
    rows = [(f"u{i}", "p", f"2019-03-{10 + (i % 3):02d}") for i in range(30)]
    versioned_insert_into(_pageviews(spark, rows), table, tracker, "a", "load")

    view = read_current(spark, table, tracker)
    filtered = view.where(F.col("date") == "2019-03-11")
    assert filtered.count() == 10
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2019-03-11" in plan


def test_restrict_partitions_prunes_before_path_list(spark, tmp_path, tracker):
    """Round 14 (wide-table reads, docs/scale.md): restrict_partitions
    subsets the folded state so the path list — the driver-side
    O(partitions) term — is O(selected), and the read serves exactly
    those partitions' rows."""
    from chronicles_spark.spark import restrict_partitions
    from chronicles_spark.spark.reader import live_paths, read_version

    table = _pageview_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="alice")
    rows = [(f"u{i}", "p", f"2019-03-{10 + (i % 3):02d}") for i in range(30)]
    versioned_insert_into(_pageviews(spark, rows), table, tracker, "a", "load")

    state = tracker.current_version(table.name)
    assert len(live_paths(table, state)) == 3
    sub = restrict_partitions(state, "date", ["2019-03-11"])
    assert len(live_paths(table, sub)) == 1  # O(selected), not O(all)
    df = read_version(spark, table, sub)
    assert df.count() == 10
    # inference recovers the partition value as a date — compare as str
    assert {
        str(r["date"]) for r in df.select("date").distinct().collect()
    } == {"2019-03-11"}
    # no match → empty state (callers decide the empty-read policy)
    assert restrict_partitions(state, "date", ["2020"]).partition_versions == {}


def test_multi_partition_orc(spark, tmp_path, tracker):
    """MultiPartitionTableSpec.scala:22-122 condensed — 2 partition cols, ORC."""
    table = TableDefinition(
        name=TableName("chronicles_test", "ad_impressions"),
        location=str(tmp_path / "impressions"),
        partition_schema=PartitionSchema(("impression_date", "processed_date")),
        format=FileFormat.ORC,
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="bob")
    df = spark.createDataFrame(
        [
            Row(user_id="u1", ad_id="a1", impression_date="2019-03-13", processed_date="2019-03-14"),
            Row(user_id="u2", ad_id="a2", impression_date="2019-03-14", processed_date="2019-03-14"),
        ]
    )
    tv, _ = versioned_insert_into(df, table, tracker, "bob", "batch spanning midnight")
    assert len(tv.partition_versions) == 2
    view = read_current(spark, table, tracker)
    assert view.count() == 2
    # amended re-run of one partition
    df2 = spark.createDataFrame(
        [Row(user_id="u9", ad_id="a1", impression_date="2019-03-13", processed_date="2019-03-14")]
    )
    versioned_insert_into(df2, table, tracker, "bob", "amend day1")
    view2 = read_current(spark, table, tracker)
    assert view2.count() == 2
    assert view2.where(F.col("user_id") == "u9").count() == 1


def test_snapshot_table_lifecycle(spark, tmp_path, tracker):
    """SnapshotTableSpec.scala:33-104 condensed."""
    table = TableDefinition(
        name=TableName("chronicles_test", "users"),
        location=str(tmp_path / "users"),
        partition_schema=PartitionSchema(()),
    )
    tracker.init_table(table.name, is_snapshot=True, user_id="carol")
    v1_rows = [Row(id="1", name="A", email="a@x"), Row(id="2", name="B", email="b@x")]
    v2_rows = [Row(id="1", name="A2", email="a@x"), Row(id="3", name="C", email="c@x")]
    versioned_insert_into(spark.createDataFrame(v1_rows), table, tracker, "carol", "v1")
    c1 = tracker.table_state(table.name).current_version
    versioned_insert_into(spark.createDataFrame(v2_rows), table, tracker, "carol", "v2")

    cur = read_current(spark, table, tracker)
    assert {r["name"] for r in cur.collect()} == {"A2", "C"}
    # rollback to v1
    tracker.set_current_version(table.name, c1)
    assert {r["name"] for r in read_current(spark, table, tracker).collect()} == {"A", "B"}
    # whole-table versions side by side on disk
    dirs = [d for d in os.listdir(table.location) if d.startswith("_version=")]
    assert len(dirs) == 2


def test_metastore_sync_with_inmemory(spark, tmp_path, tracker):
    """V9/V10 composition against the pointer-map metastore."""
    from chronicles_spark.versioned_metastore import VersionedMetastore

    table = _pageview_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    ms = InMemoryMetastore()
    ms.create_table(table)
    versioned_insert_into(
        _pageviews(spark, [("u1", "p", "2019-01-01")]), table, tracker, "a", "w1",
        metastore=ms,
    )
    assert len(ms.current_version(table).partition_versions) == 1
    vm = VersionedMetastore(tracker, ms)
    head0 = tracker.table_state(table.name).updates[0].metadata.commit_id
    tv, changes = vm.checkout(table, head0)  # rollback to empty init
    assert tv == PartitionedTableVersion({})
    assert ms.current_version(table).partition_versions == {}


def test_optimistic_write_conflict_and_auto_merge(spark, tmp_path, tracker):
    """concurrency="optimistic": a concurrent overwrite of the SAME
    partition conflicts (data stays invisible); a concurrent write of a
    DIFFERENT partition auto-merges.  Simulates the second writer by
    committing through a separate tracker instance on the same log."""
    from chronicles_spark.trackers import CommitConflictError

    table = _pageview_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    versioned_insert_into(
        _pageviews(spark, [(1, "/a", "2019-01-01")]), table, tracker, "a", "v1"
    )

    # writer A reads its base state, then writer B lands an overwrite of
    # 2019-01-01 before A commits — the read-modify-write race
    base = tracker.table_state(table.name).current_version
    other = FileBackedVersionTracker(str(tmp_path / "_log"))
    versioned_insert_into(
        _pageviews(spark, [(9, "/b", "2019-01-01")]), table, other, "b", "B wins"
    )
    with pytest.raises(CommitConflictError):
        versioned_insert_into(
            _pageviews(spark, [(2, "/c", "2019-01-01")]),
            table,
            tracker,
            "a",
            "stale overwrite",
            concurrency="optimistic",
            base_head=base,
        )
    # the conflicted write never became visible
    assert {r["id"] for r in read_current(spark, table, tracker).collect()} == {9}

    # disjoint date from the SAME stale base → auto-merge despite the
    # moved head
    versioned_insert_into(
        _pageviews(spark, [(3, "/d", "2019-01-02")]),
        table,
        tracker,
        "a",
        "disjoint date",
        concurrency="optimistic",
        base_head=base,
    )
    assert {r["id"] for r in read_current(spark, table, tracker).collect()} == {9, 3}
    # (strict mode — conflict on ANY head move — is pinned per-backend in
    # tests/test_trackers.py::test_occ_strict_mode_rejects_any_head_move)

    # an unknown concurrency mode fails before any bytes are written
    with pytest.raises(ValueError, match="concurrency"):
        versioned_insert_into(
            _pageviews(spark, [(5, "/f", "2019-01-04")]),
            table,
            tracker,
            "a",
            "bad mode",
            concurrency="pessimistic",
        )


def test_partitions_written_distributed_parity(spark, tmp_path):
    """The executor-fanned listing discovery returns exactly the driver
    walk's partition set (threshold forced low to trigger the fan-out),
    and rejects __HIVE_DEFAULT_PARTITION__ the same way."""
    from pyspark.sql import functions as F

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.writer import partitions_written, write_versioned

    table = TableDefinition(
        TableName("db", "many"), str(tmp_path / "many"),
        PartitionSchema(("a", "b")),
    )
    df = spark.range(40).select(
        F.col("id"),
        (F.col("id") % 8).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
    )
    v = generate_version()
    write_versioned(df, table, v)
    # plant an older version dir that must NOT leak into this version's set
    stale = tmp_path / "many" / "a=0" / "b=9" / "_version=xx"
    stale.mkdir(parents=True)

    driver = sorted(p.path for p in partitions_written(table, v))
    dist = sorted(
        p.path
        for p in partitions_written(table, v, spark=spark, distribute_threshold=2)
    )
    assert dist == driver and len(driver) == 24  # 8 a-values x 3 b-values


def test_partitions_written_falls_back_when_executors_lack_package(
    spark, tmp_path, monkeypatch
):
    """On a cluster whose executors don't have chronicles_spark installed,
    the fan-out job dies with an executor-side ModuleNotFoundError AFTER
    the data already landed.  partitions_written must degrade to the
    serial driver walk instead of stranding the write uncommitted
    (round-4 advice)."""
    from pyspark.sql import functions as F

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.writer import partitions_written, write_versioned

    table = TableDefinition(
        TableName("db", "fanout"), str(tmp_path / "fanout"),
        PartitionSchema(("a",)),
    )
    df = spark.range(12).select(
        F.col("id"), (F.col("id") % 6).cast("string").alias("a")
    )
    v = generate_version()
    write_versioned(df, table, v)
    serial = sorted(p.path for p in partitions_written(table, v))

    def _boom(*a, **k):
        raise Exception(
            "Job aborted due to stage failure: ... "
            "ModuleNotFoundError: No module named 'chronicles_spark'"
        )

    monkeypatch.setattr(spark.sparkContext, "parallelize", _boom)
    import pytest as _pt

    with _pt.warns(RuntimeWarning, match="cannot import chronicles_spark"):
        got = sorted(
            p.path
            for p in partitions_written(
                table, v, spark=spark, distribute_threshold=2
            )
        )
    assert got == serial and len(got) == 6

    # any OTHER executor failure still surfaces
    def _other(*a, **k):
        raise Exception("Job aborted: executor OOM")

    monkeypatch.setattr(spark.sparkContext, "parallelize", _other)
    import pytest as _pytest

    with _pytest.raises(Exception, match="OOM"):
        partitions_written(table, v, spark=spark, distribute_threshold=2)
