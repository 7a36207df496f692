"""spark.read.format("chronicles") — the Python Data Source over versioned
tables: current view, time travel, and partition-filter pruning."""

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.sources.datasource import ChroniclesDataSource
from chronicles_spark.spark import versioned_insert_into
from chronicles_spark.trackers import FileBackedVersionTracker


@pytest.fixture()
def versioned_table(spark, tmp_path):
    root = str(tmp_path / "_log")
    tracker = FileBackedVersionTracker(root)
    table = TableDefinition(
        TableName("demo", "pv"), str(tmp_path / "pv"), PartitionSchema(("date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    df1 = spark.createDataFrame(
        [("u1", 3, "2019-01-01"), ("u2", 5, "2019-01-02")], ["user", "n", "date"]
    )
    versioned_insert_into(df1, table, tracker, "a", "v1")
    first_commit = tracker.table_state(table.name).current_version
    df2 = spark.createDataFrame([("u9", 7, "2019-01-01")], ["user", "n", "date"])
    versioned_insert_into(df2, table, tracker, "a", "overwrite d1")
    spark.dataSource.register(ChroniclesDataSource)
    return table, root, first_commit


def _reader(spark, table, root):
    return (
        spark.read.format("chronicles")
        .option("root", root)
        .option("table", table.name.fully_qualified)
        .option("location", table.location)
    )


def test_current_view(spark, versioned_table):
    table, root, _ = versioned_table
    df = _reader(spark, table, root).load()
    rows = {(r["user"], r["n"], r["date"]) for r in df.collect()}
    assert rows == {("u9", 7, "2019-01-01"), ("u2", 5, "2019-01-02")}


def test_time_travel_via_commit_option(spark, versioned_table):
    table, root, first_commit = versioned_table
    df = _reader(spark, table, root).option("commit", first_commit).load()
    assert {r["user"] for r in df.collect()} == {"u1", "u2"}


def test_partition_filter_prunes_dirs(spark, versioned_table):
    table, root, _ = versioned_table
    df = (
        _reader(spark, table, root)
        .option("pushdown", "true")
        .load()
        .where(F.col("date") == "2019-01-02")
    )
    assert [r["user"] for r in df.collect()] == ["u2"]
    # pruning proof: the pushed equality filter drops whole directories at
    # planning time, so the filtered scan plans 1 input partition vs 2
    full = _reader(spark, table, root).load()
    assert full.rdd.getNumPartitions() == 2
    assert df.rdd.getNumPartitions() == 1


def test_sql_over_datasource(spark, versioned_table):
    table, root, _ = versioned_table
    _reader(spark, table, root).load().createOrReplaceTempView("pv_current")
    got = spark.sql(
        "SELECT date, sum(n) AS total FROM pv_current GROUP BY date ORDER BY date"
    ).collect()
    assert [(r["date"], r["total"]) for r in got] == [
        ("2019-01-01", 7),
        ("2019-01-02", 5),
    ]


def test_snapshot_table_and_orc(spark, tmp_path):
    """Unpartitioned (snapshot) tables and ORC files through the data
    source: whole-table versions, no partition columns."""
    from chronicles_spark.core.model import PartitionSchema

    root = str(tmp_path / "_log2")
    tracker = FileBackedVersionTracker(root)
    table = TableDefinition(
        TableName("demo", "snap"),
        str(tmp_path / "snap"),
        PartitionSchema(()),  # snapshot
        format="orc",
    )
    tracker.init_table(table.name, is_snapshot=True, user_id="a")
    versioned_insert_into(
        spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]),
        table, tracker, "a", "v1",
    )
    versioned_insert_into(
        spark.createDataFrame([("c", 3)], ["k", "v"]), table, tracker, "a", "v2"
    )
    spark.dataSource.register(ChroniclesDataSource)
    df = (
        spark.read.format("chronicles")
        .option("root", root)
        .option("table", "demo.snap")
        .option("location", table.location)
        .option("format", "orc")
        .load()
    )
    # snapshot semantics: latest whole-table version only
    assert {(r["k"], r["v"]) for r in df.collect()} == {("c", 3)}


def test_in_filter_prunes_dirs(spark, versioned_table):
    table, root, _ = versioned_table
    df = (
        _reader(spark, table, root)
        .option("pushdown", "true")
        .load()
        .where(F.col("date").isin("2019-01-02", "2019-09-09"))
    )
    assert [r["user"] for r in df.collect()] == ["u2"]
    assert df.rdd.getNumPartitions() == 1  # only the matching dir planned


def test_stats_pushdown_data_skips_directories(spark, tmp_path):
    """Comparison filters on DATA columns prune whole directories via the
    stats sidecars, while the row filter still runs (values stay exact)."""
    root = str(tmp_path / "_log")
    tracker = FileBackedVersionTracker(root)
    table = TableDefinition(
        TableName("demo", "stats"), str(tmp_path / "stats"), PartitionSchema(("date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    rows = [
        (i + 100 * p, f"2019-01-0{p + 1}") for p in range(3) for i in range(100)
    ]
    versioned_insert_into(
        spark.createDataFrame(rows, ["n", "date"]),
        table, tracker, "a", "v1", stats_columns="*",
    )
    spark.dataSource.register(ChroniclesDataSource)

    base = _reader(spark, table, root).option("pushdown", "true")
    full = base.load()
    assert full.rdd.getNumPartitions() == 3

    gt = base.load().where(F.col("n") > 150)
    assert gt.rdd.getNumPartitions() == 2  # dir [0,99] proved empty
    assert sorted(r["n"] for r in gt.collect()) == list(range(151, 300))

    # equality bound prunes to ONE directory; strict bounds stay conservative
    eq = base.load().where(F.col("n") == 120)
    assert eq.rdd.getNumPartitions() == 1
    assert [r["n"] for r in eq.collect()] == [120]

    # combined with partition pruning: both layers apply
    both = base.load().where((F.col("date") == "2019-01-03") & (F.col("n") <= 250))
    assert both.rdd.getNumPartitions() == 1
    assert sorted(r["n"] for r in both.collect()) == list(range(200, 251))

    # a range no directory can satisfy plans zero rows without error
    none = base.load().where(F.col("n") > 10_000)
    assert none.count() == 0


def test_unknown_commit_id_raises_not_silent_head(spark, versioned_table):
    """A typo'd commit id must surface as an error — a bare log fold would
    silently return the HEAD state instead (version_at's UnknownCommitError
    contract, shared with read_at_commit)."""
    from pyspark.errors import AnalysisException

    table, root, _ = versioned_table
    with pytest.raises(AnalysisException, match="no-such-commit"):
        # schema resolution already folds the log → fails at load(), before
        # any scan is planned
        _reader(spark, table, root).option("commit", "no-such-commit").load()


def test_tag_option_reads_pinned_state(spark, versioned_table):
    """.option("tag", name) resolves through the tracker's tag pointer;
    unknown tags and commit+tag together are errors."""
    from chronicles_spark.trackers import FileBackedVersionTracker

    table, root, first_commit = versioned_table
    FileBackedVersionTracker(root).set_tag(table.name, "v1", first_commit)

    df = _reader(spark, table, root).option("tag", "v1").load()
    assert {r["user"] for r in df.collect()} == {"u1", "u2"}

    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="unknown tag"):
        _reader(spark, table, root).option("tag", "nope").load()
    with pytest.raises(AnalysisException, match="at most one"):
        (_reader(spark, table, root)
         .option("tag", "v1").option("commit", first_commit).load())


def test_timestamp_option_reads_as_of_state(spark, versioned_table):
    """.option("timestamp", iso) resolves the newest commit at-or-before the
    given wall-clock time; combining selectors is an error."""
    from pyspark.errors import AnalysisException

    table, root, first_commit = versioned_table
    tr = FileBackedVersionTracker(root)
    updates = list(tr.table_state(table.name).updates)
    ts_first = next(
        u.metadata.timestamp for u in updates
        if u.metadata.commit_id == first_commit
    )

    df = _reader(spark, table, root).option("timestamp", ts_first.isoformat()).load()
    assert {r["user"] for r in df.collect()} == {"u1", "u2"}  # pre-overwrite

    with pytest.raises(AnalysisException, match="no commit at or before"):
        _reader(spark, table, root).option("timestamp", "1999-01-01T00:00:00").load()
    with pytest.raises(AnalysisException, match="at most one"):
        (_reader(spark, table, root)
         .option("timestamp", ts_first.isoformat())
         .option("commit", first_commit).load())


def test_branch_option_reads_staged_state(spark, versioned_table):
    """.option("branch", ...) resolves against the branch's log — the
    audit-read surface of the Write-Audit-Publish flow."""
    from chronicles_spark import branching as B
    from chronicles_spark.trackers import FileBackedVersionTracker

    table, root, _ = versioned_table
    tracker = FileBackedVersionTracker(root)
    B.create_branch(tracker, table.name, "staging", "a")
    bdef = B.branch_table_def(table, "staging")
    staged = spark.createDataFrame([("s1", 9, "2019-01-03")], ["user", "n", "date"])
    versioned_insert_into(staged, bdef, tracker, "a", "stage")

    got = _reader(spark, table, root).option("branch", "staging").load()
    assert {r["user"] for r in got.collect()} == {"u9", "u2", "s1"}
    # main reader unchanged
    main = _reader(spark, table, root).load()
    assert {r["user"] for r in main.collect()} == {"u9", "u2"}
    # unknown branch surfaces as an error
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        _reader(spark, table, root).option("branch", "nope").load().collect()
