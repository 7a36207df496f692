"""Branches + Write-Audit-Publish merge (chronicles_spark/branching.py),
run against every tracker backend (the shared behaviour-suite pattern,
VersionTrackerSpec.scala:26-495), plus drop_table, vacuum protection of
branch-referenced versions, and one end-to-end WAP flow on Spark.
"""

from datetime import datetime, timezone

import pytest

from chronicles_spark import branching as B
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

T = TableName("db", "events")
P1 = Partition.of(("date", "2024-01-01"))
P2 = Partition.of(("date", "2024-01-02"))


@pytest.fixture(params=["memory", "files", "files-cas", "sqlite"])
def tracker(request, tmp_path):
    if request.param == "memory":
        return InMemoryVersionTracker()
    if request.param == "files":
        return FileBackedVersionTracker(str(tmp_path / "log"))
    if request.param == "files-cas":
        # branch/merge/rebase algebra over the conditional-put protocol
        return FileBackedVersionTracker(str(tmp_path / "log"), use_cas=True)
    return SqliteVersionTracker(str(tmp_path / "log.db"))


def _commit(tracker, name, *ops, msg="update"):
    meta = TableUpdateMetadata.new("alice", msg)
    tracker.commit(name, TableUpdate(meta, tuple(ops)))
    return meta.commit_id


def _init(tracker):
    tracker.init_table(T, is_snapshot=False, user_id="alice")


# -- drop_table (new tracker primitive) ------------------------------------


def test_drop_table(tracker):
    _init(tracker)
    v = generate_version()
    c = _commit(tracker, T, AddPartitionVersion(P1, v))
    tracker.set_tag(T, "pin", c)
    tracker.drop_table(T)
    assert tracker.tables() == []
    with pytest.raises(UnknownTableError):
        tracker.table_state(T)
    with pytest.raises(UnknownTableError):
        tracker.drop_table(T)
    # re-init starts a FRESH log (no resurrecting old commits or tags)
    _init(tracker)
    assert len(tracker.table_state(T).updates) == 1
    assert tracker.tags(T) == {}


# -- branch lifecycle -------------------------------------------------------


def test_create_branch_snapshots_state(tracker):
    _init(tracker)
    v1 = generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    btn = B.create_branch(tracker, T, "staging", "alice")
    assert btn == TableName("db", "events__branch_staging")
    assert B.branches(tracker, T) == {"staging": btn}
    # branch resolves to the same state as main at the branch point
    assert tracker.current_version(btn).partition_versions == {P1: v1}
    # the branch point is pinned as a tag on the branch
    assert B.BRANCH_POINT_TAG in tracker.tags(btn)


def test_branch_name_validation(tracker):
    _init(tracker)
    for bad in ("Staging", "1x", "a-b", "x__branch_y", ""):
        with pytest.raises(B.BranchError):
            B.create_branch(tracker, T, bad, "alice")
    btn = B.create_branch(tracker, T, "ok", "alice")
    with pytest.raises(B.BranchError, match="already exists"):
        B.create_branch(tracker, T, "ok", "alice")
    with pytest.raises(B.BranchError, match="branch a branch"):
        B.create_branch(tracker, btn, "nested", "alice")


def test_branch_writes_isolated_from_main(tracker):
    _init(tracker)
    v1, v2 = generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    btn = B.create_branch(tracker, T, "staging", "alice")
    _commit(tracker, btn, AddPartitionVersion(P2, v2))
    assert P2 not in tracker.current_version(T).partition_versions
    assert tracker.current_version(btn).partition_versions[P2] == v2


def test_merge_publishes_changes(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "staging", "alice")
    btn = B.branch_table_name(T, "staging")
    _commit(tracker, btn, AddPartitionVersion(P2, v2))  # new partition
    _commit(tracker, btn, AddPartitionVersion(P1, v3))  # overwrite existing

    state, _ = B.merge_branch(table, tracker, "staging", "alice", "publish")
    assert state.partition_versions == {P1: v3, P2: v2}
    # one merge commit on main
    assert len(tracker.updates(T)) == 3  # init + w1 + merge


def test_merge_disjoint_main_write_is_safe(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "staging", "alice")
    btn = B.branch_table_name(T, "staging")
    _commit(tracker, btn, AddPartitionVersion(P2, v2))
    # main writes a DIFFERENT partition meanwhile
    p3 = Partition.of(("date", "2024-01-03"))
    _commit(tracker, T, AddPartitionVersion(p3, v3))

    state, _ = B.merge_branch(table, tracker, "staging", "alice", "publish")
    assert state.partition_versions == {P1: v1, P2: v2, p3: v3}


def test_merge_conflict_on_same_partition(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "staging", "alice")
    btn = B.branch_table_name(T, "staging")
    _commit(tracker, btn, AddPartitionVersion(P1, v2))
    _commit(tracker, T, AddPartitionVersion(P1, v3))  # main changed it too

    with pytest.raises(B.MergeConflictError, match="date=2024-01-01"):
        B.merge_branch(table, tracker, "staging", "alice", "publish")
    # main untouched by the failed merge
    assert tracker.current_version(T).partition_versions == {P1: v3}


def test_merge_carries_branch_removals(tracker):
    _init(tracker)
    v1 = generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "staging", "alice")
    btn = B.branch_table_name(T, "staging")
    from chronicles_spark.core.ops import RemovePartition

    _commit(tracker, btn, RemovePartition(P1))
    state, _ = B.merge_branch(table, tracker, "staging", "alice", "drop p1")
    assert state.partition_versions == {}


def test_merge_identical_change_both_sides_is_clean(tracker):
    _init(tracker)
    v1, v2 = generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "staging", "alice")
    btn = B.branch_table_name(T, "staging")
    from chronicles_spark.core.ops import RemovePartition

    # both sides remove P1, branch also adds P2
    _commit(tracker, btn, RemovePartition(P1), AddPartitionVersion(P2, v2))
    _commit(tracker, T, RemovePartition(P1))
    state, _ = B.merge_branch(table, tracker, "staging", "alice", "publish")
    assert state.partition_versions == {P2: v2}


def test_cli_merge_conflict_is_an_error_not_a_crash():
    import chronicles_spark.cli as C
    from tests.test_cli import make_client

    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "w1"],
          client, console, "u")
    C.run(["branch", "db.t", "staging"], client, console, "u")
    C.run(["partition", "add", "db.t__branch_staging", "date=2024-01-01",
           "--message", "bw"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "mw"],
          client, console, "u")
    code = C.run(["merge", "db.t", "staging", "--message", "pub"],
                 client, console, "u")
    assert code == 1
    assert any("cannot merge" in line for line in console.err)


def test_merge_noop_and_drop_branch(tracker):
    _init(tracker)
    v1 = generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "idle", "alice")
    n_before = len(tracker.updates(T))
    state, changes = B.merge_branch(
        table, tracker, "idle", "alice", "noop", drop_branch=True
    )
    assert state.partition_versions == {P1: v1}
    assert len(tracker.updates(T)) == n_before  # no empty merge commit
    assert B.branches(tracker, T) == {}  # dropped


def test_branch_from_historical_commit(tracker):
    _init(tracker)
    v1, v2 = generate_version(), generate_version()
    c1 = _commit(tracker, T, AddPartitionVersion(P1, v1))
    _commit(tracker, T, AddPartitionVersion(P1, v2))
    btn = B.create_branch(tracker, T, "old", "alice", at_commit=c1)
    assert tracker.current_version(btn).partition_versions == {P1: v1}
    table = TableDefinition(T, "loc", PartitionSchema(("date",)))
    # an UNCHANGED branch merges as a no-op even though main moved on
    # (three-way: nothing changed relative to the base)
    state, _ = B.merge_branch(table, tracker, "old", "alice", "noop")
    assert state.partition_versions == {P1: v2}
    # but a branch change to a partition main ALSO changed since the base
    # conflicts
    v3 = generate_version()
    _commit(tracker, btn, AddPartitionVersion(P1, v3))
    with pytest.raises(B.MergeConflictError):
        B.merge_branch(table, tracker, "old", "alice", "clash")


def test_snapshot_table_branch_merge(tracker):
    snap = TableName("db", "snap")
    tracker.init_table(snap, is_snapshot=True, user_id="alice")
    v1, v2 = generate_version(), generate_version()
    from chronicles_spark.core.ops import AddTableVersion

    meta = TableUpdateMetadata.new("alice", "w1")
    tracker.commit(snap, TableUpdate(meta, (AddTableVersion(v1),)))
    table = TableDefinition(snap, "loc", PartitionSchema(()))
    B.create_branch(tracker, snap, "staging", "alice")
    btn = B.branch_table_name(snap, "staging")
    meta2 = TableUpdateMetadata.new("alice", "w2")
    tracker.commit(btn, TableUpdate(meta2, (AddTableVersion(v2),)))
    state, _ = B.merge_branch(table, tracker, "staging", "alice", "publish")
    assert state.version == v2


def test_merge_on_conflict_strategies(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "s1", "alice")
    btn = B.branch_table_name(T, "s1")
    _commit(tracker, btn, AddPartitionVersion(P1, v2), AddPartitionVersion(P2, v2))
    _commit(tracker, T, AddPartitionVersion(P1, v3))  # contested: P1

    with pytest.raises(ValueError, match="on_conflict"):
        B.merge_branch(table, tracker, "s1", "alice", "m", on_conflict="mine")
    # 'ours': keep main's P1, merge clean P2
    state, _ = B.merge_branch(
        table, tracker, "s1", "alice", "keep main", on_conflict="ours"
    )
    assert state.partition_versions[P1] == v3
    assert state.partition_versions[P2] == v2
    # 'theirs': branch overrides the contested partition
    B.create_branch(tracker, T, "s2", "alice")
    btn2 = B.branch_table_name(T, "s2")
    v4, v5 = generate_version(), generate_version()
    _commit(tracker, btn2, AddPartitionVersion(P1, v4))
    _commit(tracker, T, AddPartitionVersion(P1, v5))
    state, _ = B.merge_branch(
        table, tracker, "s2", "alice", "force publish", on_conflict="theirs"
    )
    assert state.partition_versions[P1] == v4


def test_rebase_branch(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "s", "alice")
    btn = B.branch_table_name(T, "s")
    _commit(tracker, btn, AddPartitionVersion(P2, v2))  # branch adds P2
    p3 = Partition.of(("date", "2024-01-03"))
    _commit(tracker, T, AddPartitionVersion(p3, v3))  # main adds P3

    # no conflicts: rebase folds main's progress under the branch change
    state, conflicts = B.rebase_branch(table, tracker, "s", "alice")
    assert conflicts == []
    assert state.partition_versions == {P1: v1, P2: v2, p3: v3}
    # and the merge is now clean even though main moved since creation
    state, _ = B.merge_branch(table, tracker, "s", "alice", "publish")
    assert state.partition_versions == {P1: v1, P2: v2, p3: v3}


def test_rebase_branch_conflict_policies(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "s", "alice")
    btn = B.branch_table_name(T, "s")
    _commit(tracker, btn, AddPartitionVersion(P1, v2))  # branch changes P1
    _commit(tracker, T, AddPartitionVersion(P1, v3))  # main changes P1 too

    with pytest.raises(B.MergeConflictError):
        B.rebase_branch(table, tracker, "s", "alice")
    # nothing landed on the branch from the failed rebase
    assert tracker.current_version(btn).partition_versions == {P1: v2}

    state, conflicts = B.rebase_branch(
        table, tracker, "s", "alice", on_conflict="ours"
    )
    assert conflicts == ["date=2024-01-01"]
    assert state.partition_versions == {P1: v3}  # main's version stands
    # branch now merges as a no-op
    state, _ = B.merge_branch(table, tracker, "s", "alice", "noop")
    assert state.partition_versions == {P1: v3}


def test_rebase_branch_theirs_keeps_branch_change(tracker):
    _init(tracker)
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "", PartitionSchema(("date",)))
    B.create_branch(tracker, T, "s", "alice")
    btn = B.branch_table_name(T, "s")
    _commit(tracker, btn, AddPartitionVersion(P1, v2))
    _commit(tracker, T, AddPartitionVersion(P1, v3))

    state, conflicts = B.rebase_branch(
        table, tracker, "s", "alice", on_conflict="theirs"
    )
    assert conflicts == ["date=2024-01-01"]
    assert state.partition_versions == {P1: v2}  # branch change survives
    # after rebase the branch-point equals main, so merge sees P1 as a
    # clean branch change and publishes it
    state, _ = B.merge_branch(table, tracker, "s", "alice", "publish")
    assert state.partition_versions == {P1: v2}


# -- vacuum protection ------------------------------------------------------


def test_vacuum_protects_branch_versions(spark, tmp_path):
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, vacuum, versioned_insert_into

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(df, table, tracker, "u", "w1")

    B.create_branch(tracker, table.name, "staging", "u")
    bdef = B.branch_table_def(table, "staging")
    # branch-only write: these _version dirs exist ONLY in the branch log
    versioned_insert_into(
        df.withColumn("id", F.col("id") + 100), bdef, tracker, "u", "bw1"
    )
    # supersede on main twice so old main versions become candidates
    versioned_insert_into(df, table, tracker, "u", "w2")
    versioned_insert_into(df, table, tracker, "u", "w3")

    doomed = vacuum(table, tracker, keep_last=1, dry_run=True)
    branch_live = tracker.current_version(bdef.name).partition_versions
    for p, v in branch_live.items():
        live_dir = f"_version={v.label}"
        assert not any(live_dir in d for d in doomed), (
            "vacuum must keep branch-live versions"
        )
    # vacuum refuses to run against the branch name itself
    with pytest.raises(ValueError, match="branch"):
        vacuum(bdef, tracker, keep_last=1, dry_run=True)
    # after the branch is deleted, its branch-ONLY dirs become orphans
    # (unknown to any log) — reclaimable only by the age-guarded sweep,
    # never silently doomed by the log-driven candidate set
    vacuum(table, tracker, keep_last=1, dry_run=False)
    B.delete_branch(tracker, table.name, "staging")
    doomed2 = vacuum(table, tracker, keep_last=1, dry_run=True)
    for p, v in branch_live.items():
        live_dir = f"_version={v.label}"
        assert not any(live_dir in d for d in doomed2)


def test_vacuum_keep_last_window_is_per_line(spark, tmp_path):
    """Branch churn must not evict main's recent history from main's
    keep_last window (review finding, round 4)."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import vacuum, versioned_insert_into

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(2).select(F.col("id"), F.lit("0").alias("d"))
    versioned_insert_into(df, table, tracker, "u", "w1")
    versioned_insert_into(df, table, tracker, "u", "w2")
    main_versions = {
        v.label
        for _p, v in __import__(
            "chronicles_spark.spark.vacuum", fromlist=["_line_versions"]
        )._line_versions(tracker, table.name)
    }
    # branch writes the same partition twice (newer labels than main's)
    B.create_branch(tracker, table.name, "busy", "u")
    bdef = B.branch_table_def(table, "busy")
    versioned_insert_into(df, bdef, tracker, "u", "bw1")
    versioned_insert_into(df, bdef, tracker, "u", "bw2")

    doomed = vacuum(table, tracker, keep_last=2, dry_run=True)
    for label in main_versions:
        assert not any(label in d for d in doomed), (
            "main's newest-2 window must survive branch churn"
        )


def test_schema_guard_isolated_per_branch(spark, tmp_path):
    """A guarded branch write must not advance main's recorded schema;
    merge promotes it; the branch inherits main's schema for checks
    (review finding, round 4)."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import (
        SchemaDriftError,
        read_current,
        stored_schema,
        versioned_insert_into,
    )

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(2).select(F.col("id"), F.lit("0").alias("d"))
    versioned_insert_into(df, table, tracker, "u", "w1", schema_mode="additive")
    main_cols = {f.name for f in stored_schema(table).fields}

    B.create_branch(tracker, table.name, "staging", "u")
    bdef = B.branch_table_def(table, "staging")
    # inherited check: a type change vs MAIN's schema is rejected on the
    # branch even though the branch never recorded anything itself
    with pytest.raises(SchemaDriftError):
        versioned_insert_into(
            df.withColumn("id", F.col("id").cast("string")),
            bdef, tracker, "u", "bad", schema_mode="additive",
        )
    # additive evolution on the branch: recorded on the BRANCH sidecar only
    versioned_insert_into(
        df.withColumn("y", F.lit(1)), bdef, tracker, "u", "evolve",
        schema_mode="additive",
    )
    assert {f.name for f in stored_schema(table).fields} == main_cols
    assert "y" in {f.name for f in stored_schema(bdef).fields}

    # publish: merge promotes the branch's schema to main
    B.merge_branch(table, tracker, "staging", "u", "publish", drop_branch=True)
    assert "y" in {f.name for f in stored_schema(table).fields}
    # and a guarded main write with the merged shape passes
    versioned_insert_into(
        df.withColumn("y", F.lit(2)), table, tracker, "u", "w2",
        schema_mode="strict",
    )
    assert read_current(spark, table, tracker).count() == 2


def test_cli_branch_and_merge_verbs():
    import chronicles_spark.cli as C
    from tests.test_cli import make_client

    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "w1"],
          client, console, "u")
    assert C.run(["branch", "db.t", "staging"], client, console, "u") == 0
    assert "Created branch 'staging'" in console.out[-1]
    C.run(["branch", "db.t"], client, console, "u")
    assert console.out[-1].startswith("staging ")
    # stage a write on the branch via the partition verb, then publish
    C.run(["partition", "add", "db.t__branch_staging", "date=2024-01-02",
           "--message", "bw"], client, console, "u")
    code = C.run(["merge", "db.t", "staging", "--message", "publish",
                  "--drop-branch"], client, console, "u")
    assert code == 0
    assert "Merged branch 'staging'" in console.out[-1]
    C.run(["partitions", "db.t"], client, console, "u")
    assert "date=2024-01-02" in console.out[-1]
    C.run(["branch", "db.t"], client, console, "u")  # empty listing
    code = C.run(["branch", "db.t", "nope", "--delete"], client, console, "u")
    assert code == 1  # unknown branch surfaces as CLI error


def test_cli_rebase_and_on_conflict():
    import chronicles_spark.cli as C
    from tests.test_cli import make_client

    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "w1"],
          client, console, "u")
    C.run(["branch", "db.t", "s"], client, console, "u")
    C.run(["partition", "add", "db.t__branch_s", "date=2024-01-01",
           "--message", "bw"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2024-01-01", "--message", "mw"],
          client, console, "u")
    # conflicted rebase errors cleanly...
    assert C.run(["rebase", "db.t", "s"], client, console, "u") == 1
    # ...and resolves with a policy, after which merge is clean
    assert C.run(["rebase", "db.t", "s", "--on-conflict", "theirs"],
                 client, console, "u") == 0
    assert "resolved: theirs" in console.out[-1]
    assert C.run(["merge", "db.t", "s", "--message", "pub", "--drop-branch"],
                 client, console, "u") == 0


def test_streaming_wap_sink_into_branch(spark, tmp_path):
    """Streaming ingest composes with branches: the micro-batch sink lands
    commits on a STAGING branch, main readers see nothing until merge —
    WAP for continuous ingest, zero new plumbing."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, versioned_insert_into
    from chronicles_spark.streaming.ingest import versioned_stream_sink

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("stream", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")
    seed = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(seed, table, tracker, "etl", "seed")

    B.create_branch(tracker, table.name, "ingest", "etl")
    bdef = B.branch_table_def(table, "ingest")
    src = str(tmp_path / "src")
    batch = spark.range(100, 108).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    batch.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        versioned_stream_sink(
            stream, bdef, tracker, "etl", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # staged rows invisible on main, visible on the branch
    assert read_current(spark, table, tracker).count() == 4
    staged = read_current(spark, bdef, tracker)
    assert staged.where(F.col("id") >= 100).count() == 8

    B.merge_branch(table, tracker, "ingest", "etl", "publish", drop_branch=True)
    final = read_current(spark, table, tracker)
    assert final.where(F.col("id") >= 100).count() == 8


def test_wap_end_to_end(spark, tmp_path):
    """The Write-Audit-Publish flow: write to branch, audit, publish."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, versioned_insert_into

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "docs"), str(tmp_path / "docs"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    good = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(good, table, tracker, "u", "seed")

    # WRITE: land a new batch on a staging branch
    B.create_branch(tracker, table.name, "wap", "u")
    bdef = B.branch_table_def(table, "wap")
    batch = spark.range(100, 106).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(batch, bdef, tracker, "u", "stage batch")

    # main readers still see only the seed
    assert read_current(spark, table, tracker).count() == 6
    # AUDIT: the staged view is readable for quality checks
    staged = read_current(spark, bdef, tracker)
    assert staged.count() == 6  # branch overwrote both partitions
    assert staged.where(F.col("id") >= 100).count() == 6

    # PUBLISH
    B.merge_branch(table, tracker, "wap", "u", "publish batch", drop_branch=True)
    final = read_current(spark, table, tracker)
    assert final.count() == 6
    assert final.where(F.col("id") >= 100).count() == 6


def test_stale_branch_sidecar_cleared_on_delete_and_create(spark, tmp_path):
    """delete_branch(location=...) and create_branch(location=...) clear
    the branch's schema sidecar so a recreated branch inherits MAIN's
    schema, not a dead branch's (round-4 review finding)."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import stored_schema, versioned_insert_into

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(2).select(F.col("id"), F.lit("0").alias("d"))
    versioned_insert_into(df, table, tracker, "u", "w1", schema_mode="additive")

    B.create_branch(tracker, table.name, "s", "u", location=table.location)
    bdef = B.branch_table_def(table, "s")
    versioned_insert_into(
        df.withColumn("y", F.lit(1)), bdef, tracker, "u", "evolve",
        schema_mode="additive",
    )
    assert "y" in {f.name for f in stored_schema(bdef).fields}
    # abandon the branch WITH location: sidecar goes too
    B.delete_branch(tracker, table.name, "s", location=table.location)

    B.create_branch(tracker, table.name, "s", "u", location=table.location)
    # the recreated branch inherits main's schema (no stale 'y')
    assert "y" not in {f.name for f in stored_schema(bdef).fields}


def test_merge_syncs_metastore(tracker):
    """merge_branch's metastore path: the publish lands the branch's
    pointers in the catalog via the incremental diff."""
    from chronicles_spark.spark.metastore import InMemoryMetastore

    _init(tracker)
    v1, v2 = generate_version(), generate_version()
    _commit(tracker, T, AddPartitionVersion(P1, v1))
    table = TableDefinition(T, "", PartitionSchema(("date",)))
    ms = InMemoryMetastore()
    ms.create_table(table)
    ms.add_partition(table, P1, v1)  # catalog in sync with main

    B.create_branch(tracker, T, "s", "alice")
    btn = B.branch_table_name(T, "s")
    _commit(tracker, btn, AddPartitionVersion(P2, v2))
    state, changes = B.merge_branch(
        table, tracker, "s", "alice", "publish", metastore=ms
    )
    assert ms.current_version(table) == state
    assert changes  # the diff issued at least the AddPartition for P2


def test_noop_merge_still_promotes_branch_schema(spark, tmp_path):
    """A merge that lands ZERO data ops (every contested partition resolved
    'ours') with drop_branch=True must still promote the branch's recorded
    schema before deleting the branch sidecar — otherwise schema evolution
    from guarded branch writes is silently lost (round-4 advice)."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import stored_schema, versioned_insert_into

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(2).select(F.col("id"), F.lit("0").alias("d"))
    versioned_insert_into(df, table, tracker, "u", "w1", schema_mode="additive")

    B.create_branch(tracker, table.name, "evolve", "u", location=table.location)
    bdef = B.branch_table_def(table, "evolve")
    # additive evolution recorded on the BRANCH sidecar
    versioned_insert_into(
        df.withColumn("y", F.lit(1)), bdef, tracker, "u", "bw",
        schema_mode="additive",
    )
    # main overwrites the same partition → the branch change is contested
    versioned_insert_into(df, table, tracker, "u", "w2", schema_mode="additive")

    state, changes = B.merge_branch(
        table, tracker, "evolve", "u", "noop publish",
        drop_branch=True, on_conflict="ours",
    )
    assert changes == []  # no data ops landed
    assert "y" in {f.name for f in stored_schema(table).fields}, (
        "no-op merge dropped the branch's schema evolution"
    )


def test_failed_create_branch_keeps_prior_sidecar(spark, tmp_path):
    """create_branch validating a bogus at_commit must raise WITHOUT side
    effects: a dead prior branch's schema sidecar survives the failed
    attempt (round-4 advice: validation before cleanup)."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import stored_schema, versioned_insert_into
    from chronicles_spark.trackers.base import UnknownCommitError

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(2).select(F.col("id"), F.lit("0").alias("d"))
    versioned_insert_into(df, table, tracker, "u", "w1", schema_mode="additive")

    # first life of the branch records a sidecar, then dies WITHOUT
    # location (sidecar left behind — the shape create_branch cleans up)
    B.create_branch(tracker, table.name, "stage", "u", location=table.location)
    bdef = B.branch_table_def(table, "stage")
    versioned_insert_into(
        df.withColumn("y", F.lit(1)), bdef, tracker, "u", "bw",
        schema_mode="additive",
    )
    B.delete_branch(tracker, table.name, "stage")
    assert "y" in {f.name for f in stored_schema(bdef).fields}

    with pytest.raises(UnknownCommitError):
        B.create_branch(
            tracker, table.name, "stage", "u",
            at_commit="no-such-commit", location=table.location,
        )
    assert "y" in {f.name for f in stored_schema(bdef).fields}, (
        "failed create_branch deleted the prior sidecar"
    )
    # a successful create still clears it (branch falls back to
    # inheriting MAIN's recorded schema, which never saw y)
    B.create_branch(tracker, table.name, "stage", "u", location=table.location)
    assert "y" not in {f.name for f in stored_schema(bdef).fields}
