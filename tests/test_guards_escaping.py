"""Tests for round-2 hardening: W3 config guard, null partition rejection,
Hive path escaping, hive_expr quoting, fold keyed by (table_name, part),
sqlite zero-op commits."""

from __future__ import annotations

import pytest

from chronicles_spark.core import paths as vpaths
from chronicles_spark.core.model import (
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.trackers import SqliteVersionTracker
from chronicles_spark.core.ops import TableUpdate, TableUpdateMetadata


# -- Hive path escaping -----------------------------------------------------


@pytest.mark.parametrize(
    "raw,escaped",
    [
        ("plain-value_1.2", "plain-value_1.2"),
        ("a/b", "a%2Fb"),
        ("a:b", "a%3Ab"),
        ("50%", "50%25"),
        ("it's", "it%27s"),
        ("a=b", "a%3Db"),
        ("tab\tchar", "tab%09char"),
    ],
)
def test_escape_path_name_roundtrip(raw, escaped):
    assert vpaths.escape_path_name(raw) == escaped
    assert vpaths.unescape_path_name(escaped) == raw


def test_resolve_path_escapes_values_but_log_path_stays_raw():
    p = Partition.of(("event_date", "2024/01/05"))
    assert p.path == "event_date=2024/01/05"  # raw, for the commit log
    assert (
        p.resolve_path("s3://bucket/t") == "s3://bucket/t/event_date=2024%2F01%2F05"
    )


def test_hive_expr_escapes_quotes():
    p = Partition.of(("k", "it's"), ("k2", "back\\slash"))
    assert p.hive_expr() == "(k='it\\'s',k2='back\\\\slash')"


# -- W3 guard + null partition rejection (needs Spark) ----------------------


def test_versioned_insert_requires_dynamic_overwrite_mode(spark, tmp_path):
    from chronicles_spark.spark import versioned_insert_into
    from chronicles_spark.trackers import InMemoryVersionTracker

    df = spark.range(3).selectExpr("id", "cast(id % 2 as string) as p")
    table = TableDefinition(
        TableName("t", "guard"), str(tmp_path / "t"), PartitionSchema(("p",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        with pytest.raises(RuntimeError, match="partitionOverwriteMode"):
            versioned_insert_into(df, table, tracker, "t", "m")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    # nothing was committed
    assert len(tracker.table_state(table.name).updates) == 1


def test_null_partition_values_rejected(spark, tmp_path):
    from chronicles_spark.spark import versioned_insert_into
    from chronicles_spark.trackers import InMemoryVersionTracker

    df = spark.range(3).selectExpr(
        "id", "case when id = 1 then null else 'a' end as p"
    )
    table = TableDefinition(
        TableName("t", "nulls"), str(tmp_path / "t"), PartitionSchema(("p",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    with pytest.raises(ValueError, match="null"):
        versioned_insert_into(df, table, tracker, "t", "m")
    assert len(tracker.table_state(table.name).updates) == 1


def test_escaped_partition_roundtrip_through_write_and_read(spark, tmp_path):
    """A partition value containing '/' and ':' must write, commit, and read
    back through the current view."""
    from pyspark.sql import functions as F

    from chronicles_spark.spark import read_current, versioned_insert_into
    from chronicles_spark.trackers import InMemoryVersionTracker

    df = spark.createDataFrame(
        [(1, "2024/01:a"), (2, "2024/01:a"), (3, "plain")], ["id", "p"]
    )
    table = TableDefinition(
        TableName("t", "esc"), str(tmp_path / "t"), PartitionSchema(("p",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    versioned_insert_into(df, table, tracker, "t", "m")

    view = read_current(spark, table, tracker)
    got = sorted((r["id"], r["p"]) for r in view.select("id", "p").collect())
    assert got == [(1, "2024/01:a"), (2, "2024/01:a"), (3, "plain")]


# -- fold keyed by (table_name, part) ---------------------------------------


def test_fold_does_not_clobber_same_part_across_tables(spark):
    from chronicles_spark.plans import log_queries as LQ

    rows = [
        # (sequence_id, table_name, op, part, version, index_in_commit)
        (1, "db.a", "add_part_version", "d=1", "v1", 0),
        (2, "db.b", "add_part_version", "d=1", "v9", 0),
        (3, "db.a", "remove_part", "d=1", None, 0),
    ]
    ops = spark.createDataFrame(
        rows,
        "sequence_id long, table_name string, operation_type string, "
        "part string, version string, index_in_commit int",
    )
    # db.a's d=1 was removed; db.b's d=1 must survive with its own version
    a = LQ.current_version_fold(ops, table_name="db.a").collect()
    b = LQ.current_version_fold(ops, table_name="db.b").collect()
    both = LQ.current_version_fold(ops).collect()
    assert a == []
    assert [(r["part"], r["version"]) for r in b] == [("d=1", "v9")]
    assert [(r["part"], r["version"]) for r in both] == [("d=1", "v9")]


def test_snapshot_fold_groups_per_table_when_unfiltered(spark):
    from chronicles_spark.plans import log_queries as LQ

    rows = [
        (1, "db.a", "add_table_version", None, "va1", 0),
        (2, "db.b", "add_table_version", None, "vb1", 0),
        (3, "db.a", "add_table_version", None, "va2", 0),
    ]
    ops = spark.createDataFrame(
        rows,
        "sequence_id long, table_name string, operation_type string, "
        "part string, version string, index_in_commit int",
    )
    one = LQ.snapshot_version_fold(ops, table_name="db.a").collect()
    assert [r["current_table_version"] for r in one] == ["va2"]
    per_table = {
        r["table_name"]: r["current_table_version"]
        for r in LQ.snapshot_version_fold(ops).collect()
    }
    assert per_table == {"db.a": "va2", "db.b": "vb1"}


# -- sqlite zero-op commits -------------------------------------------------


def test_sqlite_zero_op_commit_survives_and_is_checkoutable():
    t = SqliteVersionTracker()
    name = TableName("db", "t")
    t.init_table(name, is_snapshot=False, user_id="u")
    empty = TableUpdate(TableUpdateMetadata.new("u", "empty write"), ())
    t.commit(name, empty)

    state = t.table_state(name)
    assert len(state.updates) == 2
    assert state.updates[1].operations == ()
    assert [m.message for m in t.updates(name)] == ["empty write", "init"]
    # head moves to the empty commit; set_current_version accepts it
    first = state.updates[0].metadata.commit_id
    t.set_current_version(name, first)
    t.set_current_version(name, empty.metadata.commit_id)
    assert t.table_state(name).current_version == empty.metadata.commit_id


def test_versioned_insert_guard_on_unset_overwrite_mode(spark, tmp_path):
    """A vanilla session (conf never set) must hit OUR fail-fast guard, not
    Spark 4's INVALID_CONF_VALUE from validating an invalid fallback."""
    from chronicles_spark.spark import versioned_insert_into
    from chronicles_spark.trackers import InMemoryVersionTracker

    df = spark.range(3).selectExpr("id", "cast(id % 2 as string) as p")
    table = TableDefinition(
        TableName("t", "guard2"), str(tmp_path / "t2"), PartitionSchema(("p",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")

    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    try:
        with pytest.raises(RuntimeError, match="partitionOverwriteMode"):
            versioned_insert_into(df, table, tracker, "t", "m")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
