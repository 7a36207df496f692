"""Vacuum (version GC) and format breadth (CSV lifecycle; Avro gated on
connector availability)."""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import read_current, vacuum, versioned_insert_into
from chronicles_spark.spark.reader import read_at_commit
from chronicles_spark.trackers import InMemoryVersionTracker


def _mk_table(tmp_path, fmt="parquet", options=()):
    return TableDefinition(
        TableName("gc", "pageviews"),
        str(tmp_path / "pageviews"),
        PartitionSchema(("date",)),
        format=fmt,
        format_options=options,
    )


def _rows(spark, data):
    return spark.createDataFrame(data, ["user", "page", "date"])


@pytest.fixture()
def versioned_3x(spark, tmp_path):
    """date=d1 written three times (3 versions), date=d2 once."""
    table = _mk_table(tmp_path)
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    for i in range(3):
        versioned_insert_into(
            _rows(spark, [(f"u{i}", "p", "2019-01-01")]), table, tracker, "a", f"w{i}"
        )
    versioned_insert_into(
        _rows(spark, [("x", "q", "2019-01-02")]), table, tracker, "a", "w-d2"
    )
    return table, tracker


def _version_dirs(table, part):
    root = os.path.join(table.location, f"date={part}")
    return sorted(d for d in os.listdir(root) if d.startswith("_version="))


def test_vacuum_removes_superseded_keeps_live(spark, versioned_3x):
    table, tracker = versioned_3x
    assert len(_version_dirs(table, "2019-01-01")) == 3

    removed = vacuum(table, tracker, keep_last=1)
    assert len(removed) == 2
    assert len(_version_dirs(table, "2019-01-01")) == 1
    assert len(_version_dirs(table, "2019-01-02")) == 1  # untouched

    cur = read_current(spark, table, tracker)
    assert {r["user"] for r in cur.collect()} == {"u2", "x"}


def test_vacuum_dry_run_deletes_nothing(spark, versioned_3x):
    table, tracker = versioned_3x
    doomed = vacuum(table, tracker, keep_last=1, dry_run=True)
    assert len(doomed) == 2
    assert len(_version_dirs(table, "2019-01-01")) == 3


def test_vacuum_keep_last_2(spark, versioned_3x):
    table, tracker = versioned_3x
    removed = vacuum(table, tracker, keep_last=2)
    assert len(removed) == 1
    assert len(_version_dirs(table, "2019-01-01")) == 2


def test_vacuum_after_rollback_keeps_live_old_version(spark, versioned_3x):
    table, tracker = versioned_3x
    # roll back to the second write of d1: live version is now NOT the newest
    state = tracker.table_state(table.name)
    second_commit = state.updates[2].metadata.commit_id  # init, w0, w1, ...
    tracker.set_current_version(table.name, second_commit)
    live_before = {r["user"] for r in read_current(spark, table, tracker).collect()}

    vacuum(table, tracker, keep_last=1)
    # the rolled-back-to version must survive even though newer ones exist
    assert {r["user"] for r in read_current(spark, table, tracker).collect()} == live_before


def test_vacuum_distributed_matches_driver_path(spark, versioned_3x):
    """distributed=True must decide the identical doomed set (dry-run) and
    delete exactly the same directories as the driver loop."""
    table, tracker = versioned_3x

    doomed_driver = vacuum(table, tracker, keep_last=1, dry_run=True)
    doomed_dist = vacuum(
        table, tracker, keep_last=1, dry_run=True, distributed=True, spark=spark
    )
    assert doomed_dist == doomed_driver and len(doomed_dist) == 2
    # dry-run deletes nothing on either path
    assert len(_version_dirs(table, "2019-01-01")) == 3

    removed = vacuum(table, tracker, keep_last=1, distributed=True, spark=spark)
    assert removed == doomed_driver
    assert len(_version_dirs(table, "2019-01-01")) == 1
    assert len(_version_dirs(table, "2019-01-02")) == 1
    cur = read_current(spark, table, tracker)
    assert {r["user"] for r in cur.collect()} == {"u2", "x"}


def test_vacuum_distributed_requires_spark_and_real_fs(spark, versioned_3x):
    table, tracker = versioned_3x
    with pytest.raises(ValueError, match="SparkSession"):
        vacuum(table, tracker, distributed=True)
    mem_table = TableDefinition(
        TableName("gc", "mem"), "memory://b/t", PartitionSchema(("date",))
    )
    with pytest.raises(ValueError, match="process-local"):
        vacuum(mem_table, tracker, distributed=True, spark=spark)


def test_csv_lifecycle(spark, tmp_path):
    table = _mk_table(tmp_path, fmt="csv", options=(("header", "true"),))
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    versioned_insert_into(
        _rows(spark, [("u1", "p1", "2019-01-01"), ("u2", "p2", "2019-01-02")]),
        table, tracker, "a", "v1",
    )
    versioned_insert_into(
        _rows(spark, [("u9", "p9", "2019-01-01")]), table, tracker, "a", "overwrite d1"
    )
    cur = read_current(spark, table, tracker)
    assert {(r["user"], r["page"]) for r in cur.collect()} == {("u9", "p9"), ("u2", "p2")}
    first = tracker.table_state(table.name).updates[-2].metadata.commit_id
    old = read_at_commit(spark, table, tracker, first)
    assert {r["user"] for r in old.collect()} == {"u1", "u2"}


def test_avro_lifecycle_if_available(spark, tmp_path):
    probe = spark.createDataFrame([("a",)], ["c"])
    try:
        probe.write.format("avro").save(str(tmp_path / "avro_probe"))
    except Exception:
        pytest.skip("spark-avro connector not on the classpath")
    table = _mk_table(tmp_path, fmt="avro")
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    versioned_insert_into(
        _rows(spark, [("u1", "p1", "2019-01-01")]), table, tracker, "a", "v1"
    )
    cur = read_current(spark, table, tracker)
    assert {r["user"] for r in cur.collect()} == {"u1"}


def test_vacuum_on_memory_fs_location(tmp_path):
    """Storage-agnostic vacuum: data 'directories' live on the in-memory
    FS (standing in for an object store); vacuum removes superseded ones
    through the facade without touching local disk."""
    from chronicles_spark.core import paths as vpaths
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers.fs import filesystem_for

    location = f"memory://vac-{tmp_path.name}/pageviews"
    table = TableDefinition(
        TableName("gc", "mem"), location, PartitionSchema(("date",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    fs, root = filesystem_for(location)
    part = Partition((("date", "2019-01-01"),))
    versions = [generate_version() for _ in range(3)]
    for i, v in enumerate(versions):
        fs.mkdirs(vpaths.path_for(part.resolve_path(root), v))
        meta = TableUpdateMetadata.new("a", f"w{i}")
        tracker.commit(table.name, TableUpdate(meta, (AddPartitionVersion(part, v),)))

    removed = vacuum(table, tracker, keep_last=1)
    assert len(removed) == 2
    live_dir = vpaths.path_for(part.resolve_path(root), versions[-1])
    assert fs.exists(live_dir)
    for v in versions[:-1]:
        assert not fs.exists(vpaths.path_for(part.resolve_path(root), v))


def test_vacuum_never_deletes_unversioned_adopted_data(spark, tmp_path):
    """Adopt-in-place (UNVERSIONED sentinel) maps to the bare table path;
    vacuum must never remove it even when superseded."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import UNVERSIONED, generate_version

    table = _mk_table(tmp_path)
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    part = Partition((("date", "2019-01-01"),))

    # adopt pre-existing unversioned data, then supersede it twice
    os.makedirs(os.path.join(table.location, "date=2019-01-01"), exist_ok=True)
    tracker.commit(
        table.name,
        TableUpdate(TableUpdateMetadata.new("a", "adopt"),
                    (AddPartitionVersion(part, UNVERSIONED),)),
    )
    for i in range(2):
        v = generate_version()
        os.makedirs(
            os.path.join(table.location, "date=2019-01-01", f"_version={v.label}")
        )
        tracker.commit(
            table.name,
            TableUpdate(TableUpdateMetadata.new("a", f"w{i}"),
                        (AddPartitionVersion(part, v),)),
        )

    removed = vacuum(table, tracker, keep_last=1)
    # the superseded REAL version is gone; the bare partition dir survives
    assert len(removed) == 1 and "_version=" in removed[0]
    assert os.path.isdir(os.path.join(table.location, "date=2019-01-01"))


def _plant_orphan(table, part, age_days):
    """A version directory no commit ever recorded (crashed-write debris),
    with BOTH its label timestamp and its storage mtime backdated by
    ``age_days`` (the sweep requires both to exceed the age cutoff)."""
    import time
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.version import generate_version

    v = generate_version(datetime.now(timezone.utc) - timedelta(days=age_days))
    d = os.path.join(table.location, f"date={part}", f"_version={v.label}")
    os.makedirs(d)
    with open(os.path.join(d, "part-00000.parquet"), "w") as f:
        f.write("debris")
    old = time.time() - age_days * 86400
    os.utime(d, (old, old))
    return d


def test_vacuum_sweep_orphans_age_guarded(spark, versioned_3x):
    """sweep_orphans reclaims never-committed version dirs older than the
    age cutoff, leaves younger ones (possible in-flight writes), and never
    touches log-recorded or live directories."""
    table, tracker = versioned_3x
    old_orphan = _plant_orphan(table, "2019-01-01", age_days=10)
    fresh_orphan = _plant_orphan(table, "2019-01-02", age_days=0)
    # stray non-version entries must be ignored by the walk
    os.makedirs(os.path.join(table.location, "date=2019-01-01", "_tmp_junk"))
    with open(os.path.join(table.location, "notes.txt"), "w") as f:
        f.write("not a partition")

    # default vacuum is blind to orphans
    removed = vacuum(table, tracker, keep_last=3)
    assert removed == []

    doomed = vacuum(table, tracker, keep_last=3, sweep_orphans=True, dry_run=True)
    assert doomed == [old_orphan]
    assert os.path.isdir(old_orphan)  # dry run deletes nothing

    removed = vacuum(table, tracker, keep_last=3, sweep_orphans=True)
    assert removed == [old_orphan]
    assert not os.path.exists(old_orphan)
    assert os.path.isdir(fresh_orphan)  # younger than orphan_min_age: kept
    assert len(_version_dirs(table, "2019-01-01")) == 3  # committed: kept

    cur = read_current(spark, table, tracker)
    assert {r["user"] for r in cur.collect()} == {"u2", "x"}


def test_vacuum_sweep_orphans_distributed_matches_driver(spark, versioned_3x):
    """The executor-side subtree walk finds the same orphan set as the
    driver walk, and composes with the normal superseded-version sweep."""
    table, tracker = versioned_3x
    old_orphan = _plant_orphan(table, "2019-01-02", age_days=8)

    driver_doomed = vacuum(
        table, tracker, keep_last=1, sweep_orphans=True, dry_run=True
    )
    dist_doomed = vacuum(
        table, tracker, keep_last=1, sweep_orphans=True, dry_run=True,
        distributed=True, spark=spark,
    )
    assert driver_doomed == dist_doomed
    assert old_orphan in dist_doomed
    assert len(dist_doomed) == 3  # 2 superseded d1 versions + the orphan

    removed = vacuum(
        table, tracker, keep_last=1, sweep_orphans=True,
        distributed=True, spark=spark,
    )
    assert sorted(removed) == dist_doomed
    assert not os.path.exists(old_orphan)
    cur = read_current(spark, table, tracker)
    assert {r["user"] for r in cur.collect()} == {"u2", "x"}


def test_vacuum_sweep_orphans_snapshot_table(spark, tmp_path):
    """depth=0: orphan whole-table version dirs directly under the location."""
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.version import generate_version

    table = TableDefinition(
        TableName("db", "snap_orph"), str(tmp_path / "snap_orph"), PartitionSchema(())
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=True, user_id="a")
    versioned_insert_into(_rows(spark, [("a", "p", "d")]), table, tracker, "a", "v1")

    v = generate_version(datetime.now(timezone.utc) - timedelta(days=9))
    orphan = os.path.join(table.location, f"_version={v.label}")
    os.makedirs(orphan)
    import time

    old = time.time() - 9 * 86400
    os.utime(orphan, (old, old))  # the sweep checks storage mtime too

    removed = vacuum(table, tracker, sweep_orphans=True)
    assert removed == [orphan]
    assert {r["user"] for r in read_current(spark, table, tracker).collect()} == {"a"}


def test_vacuum_keeps_tagged_versions(spark, versioned_3x):
    """A tagged state's directories are pinned: vacuum skips them for the
    life of the tag, and reclaims them after delete_tag."""
    from chronicles_spark.spark import read_at_tag

    table, tracker = versioned_3x
    # tag the FIRST write of d1 (superseded twice since)
    first_commit = list(tracker.table_state(table.name).updates)[1].metadata.commit_id
    tracker.set_tag(table.name, "corpus-v1", first_commit)

    removed = vacuum(table, tracker, keep_last=1)
    # of the two superseded d1 versions only the UNtagged middle one goes
    assert len(removed) == 1
    assert len(_version_dirs(table, "2019-01-01")) == 2

    pinned = read_at_tag(spark, table, tracker, "corpus-v1")
    assert {r["user"] for r in pinned.collect()} == {"u0"}

    tracker.delete_tag(table.name, "corpus-v1")
    removed = vacuum(table, tracker, keep_last=1)
    assert len(removed) == 1  # the previously pinned version is now GC-able
    assert len(_version_dirs(table, "2019-01-01")) == 1


def test_vacuum_sweep_keeps_old_label_fresh_mtime(spark, versioned_3x):
    """A directory whose LABEL is backdated but whose files were written
    just now (skewed writer clock, or an injected historical ``version=``)
    is potentially an in-flight write — the mtime cross-check must keep it
    even though the label alone clears the age cutoff."""
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.version import generate_version

    table, tracker = versioned_3x
    v = generate_version(datetime.now(timezone.utc) - timedelta(days=30))
    d = os.path.join(table.location, "date=2019-01-01", f"_version={v.label}")
    os.makedirs(d)  # storage mtime = NOW

    doomed = vacuum(table, tracker, keep_last=3, sweep_orphans=True, dry_run=True)
    assert doomed == []
    assert os.path.isdir(d)


def test_vacuum_sweep_ignores_stray_version_named_file(spark, versioned_3x):
    """A plain FILE named _version=<old-label> must never become a
    candidate (remove_tree can't delete it; it would be re-reported as
    'removed' forever)."""
    import time
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.version import generate_version

    table, tracker = versioned_3x
    v = generate_version(datetime.now(timezone.utc) - timedelta(days=30))
    f = os.path.join(table.location, "date=2019-01-01", f"_version={v.label}")
    with open(f, "w") as fh:
        fh.write("not a directory")
    old = time.time() - 30 * 86400
    os.utime(f, (old, old))

    doomed = vacuum(table, tracker, keep_last=3, sweep_orphans=True, dry_run=True)
    assert doomed == []
    assert os.path.isfile(f)


def test_sweep_requires_mtime_evidence(tmp_path):
    """On backends whose directory prefixes carry no mtime (object stores,
    memory://), age falls back to the newest CHILD file's mtime, and with
    NO mtime evidence at all the sweep must SKIP the directory — an
    old-looking label alone (versioned_insert_into accepts caller-supplied
    historical labels) never dooms an in-flight write (round-4 review
    finding)."""
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.vacuum import _orphan_version_dirs
    from chronicles_spark.trackers.fs import MemoryFileSystem, filesystem_for

    fs, root = filesystem_for(f"memory://sweep-{tmp_path.name}/tbl")
    old_v = generate_version(datetime.now(timezone.utc) - timedelta(days=30))
    cutoff = datetime.now(timezone.utc).replace(tzinfo=None) - timedelta(days=7)

    # old label, FRESH child file (just-written data): must be skipped
    inflight = fs.join(root, "date=2024-01-01", f"_version={old_v.label}")
    fs.mkdirs(inflight)
    fs.write_text(fs.join(inflight, "part-00000.parquet"), "fresh bytes")
    assert _orphan_version_dirs(fs, root, 1, set(), cutoff) == []

    # old label, no files, no mtime evidence anywhere: still skipped
    empty = fs.join(root, "date=2024-01-02", f"_version={old_v.label}")
    fs.mkdirs(empty)
    assert _orphan_version_dirs(fs, root, 1, set(), cutoff) == []

    # old label AND old child mtime: provably abandoned -> swept
    doomed_dir = fs.join(root, "date=2024-01-03", f"_version={old_v.label}")
    fs.mkdirs(doomed_dir)
    fs.write_text(fs.join(doomed_dir, "part-00000.parquet"), "debris")
    bucket = f"sweep-{tmp_path.name}"
    MemoryFileSystem._mtimes[bucket][
        MemoryFileSystem._norm(fs.join(doomed_dir, "part-00000.parquet"))
    ] -= 30 * 86400
    assert _orphan_version_dirs(fs, root, 1, set(), cutoff) == [doomed_dir]
