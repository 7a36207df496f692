"""Schema enforcement on the versioned write path (schema_guard.py).

The reference scopes schema evolution out (README.md:48-50); these tests
cover the rebuild's opt-in Delta-style guard: strict/additive modes,
drift rejection BEFORE any bytes land, the audit trail, and that the
default mode changes nothing.
"""

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import (
    SchemaDriftError,
    read_current,
    schema_history,
    stored_schema,
    versioned_insert_into,
)
from chronicles_spark.spark.schema_guard import SCHEMA_FILE, check_schema
from chronicles_spark.trackers import FileBackedVersionTracker


def _mk_table(tmp_path, name="t"):
    tracker = FileBackedVersionTracker(str(tmp_path / f"_log_{name}"))
    table = TableDefinition(
        TableName("test", name), str(tmp_path / name), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    return table, tracker


def _df(spark, cols):
    base = spark.range(4).select(
        F.col("id"),
        (F.col("id") % 2).cast("string").alias("d"),
    )
    for name, expr in cols:
        base = base.withColumn(name, expr)
    return base


def test_first_guarded_write_records_schema(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    df = _df(spark, [("x", F.lit(1.5))])
    versioned_insert_into(df, table, tracker, "u", "m", schema_mode="strict")
    rec = stored_schema(table)
    assert rec is not None
    assert {f.name for f in rec.fields} == {"id", "d", "x"}
    # _version never leaks into the recorded schema
    assert "_version" not in {f.name for f in rec.fields}
    assert len(schema_history(table)) == 1


def test_strict_rejects_any_change_before_write(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    versioned_insert_into(
        _df(spark, [("x", F.lit(1.5))]), table, tracker, "u", "m", schema_mode="strict"
    )
    head = tracker.table_state(table.name).current_version

    # type change
    with pytest.raises(SchemaDriftError, match="type changed"):
        versioned_insert_into(
            _df(spark, [("x", F.lit("s"))]),
            table, tracker, "u", "m", schema_mode="strict",
        )
    # added column
    with pytest.raises(SchemaDriftError, match="columns added"):
        versioned_insert_into(
            _df(spark, [("x", F.lit(1.5)), ("y", F.lit(1))]),
            table, tracker, "u", "m", schema_mode="strict",
        )
    # dropped column
    with pytest.raises(SchemaDriftError, match="columns dropped"):
        versioned_insert_into(
            _df(spark, []), table, tracker, "u", "m", schema_mode="strict"
        )
    # no commit happened and no invisible files were written (guard runs
    # before the write job)
    assert tracker.table_state(table.name).current_version == head
    import os

    versions = set()
    for root, dirs, _files in os.walk(table.location):
        versions.update(d for d in dirs if d.startswith("_version="))
    assert len(versions) == 1


def test_additive_allows_new_columns_and_advances(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    versioned_insert_into(
        _df(spark, []), table, tracker, "u", "m", schema_mode="additive"
    )
    versioned_insert_into(
        _df(spark, [("y", F.lit(7))]), table, tracker, "u", "m2", schema_mode="additive"
    )
    rec = stored_schema(table)
    assert "y" in {f.name for f in rec.fields}
    assert len(schema_history(table)) == 2  # one entry per CHANGE

    # identical re-write does not append history
    versioned_insert_into(
        _df(spark, [("y", F.lit(8))]), table, tracker, "u", "m3", schema_mode="additive"
    )
    assert len(schema_history(table)) == 2

    # but drops/type changes still raise
    with pytest.raises(SchemaDriftError, match="columns dropped"):
        versioned_insert_into(
            _df(spark, []), table, tracker, "u", "m4", schema_mode="additive"
        )
    with pytest.raises(SchemaDriftError, match="type changed"):
        versioned_insert_into(
            _df(spark, [("y", F.lit("s"))]),
            table, tracker, "u", "m5", schema_mode="additive",
        )


def test_case_insensitive_names_and_nullability_ignored(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    versioned_insert_into(
        _df(spark, [("x", F.lit(1))]), table, tracker, "u", "m", schema_mode="strict"
    )
    # same columns, different case → no drift (Spark default is
    # case-insensitive resolution)
    df2 = _df(spark, [("X", F.lit(2))])
    assert check_schema(table, df2.schema, "strict") is False


def test_off_mode_records_nothing(spark, tmp_path):
    import os

    table, tracker = _mk_table(tmp_path)
    versioned_insert_into(_df(spark, []), table, tracker, "u", "m")
    assert stored_schema(table) is None
    assert not os.path.exists(os.path.join(table.location, SCHEMA_FILE))


def test_invalid_mode_rejected(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    with pytest.raises(ValueError, match="schema_mode"):
        versioned_insert_into(
            _df(spark, []), table, tracker, "u", "m", schema_mode="lenient"
        )


def test_sidecar_invisible_to_reads(spark, tmp_path):
    table, tracker = _mk_table(tmp_path)
    versioned_insert_into(
        _df(spark, []), table, tracker, "u", "m", schema_mode="additive"
    )
    # the _-prefixed sidecar at the table root must not break or pollute
    # the current-view read
    got = read_current(spark, table, tracker)
    assert got.count() == 4
    assert set(got.columns) == {"id", "d"}
