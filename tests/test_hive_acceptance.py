"""End-to-end acceptance through the REAL catalog read path (W5): versioned
writes sync the Hive metastore, and plain ``spark.table(...)`` — the way
any downstream engine reads — sees exactly the live versions.  Mirrors the
reference's acceptance suite flow
(acceptance-tests/.../DatePartitionedTableSpec.scala:40-152: write → read →
overwrite partition → read → rollback → read)."""

import uuid

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import versioned_insert_into
from chronicles_spark.spark.metastore import SparkHiveMetastore
from chronicles_spark.trackers import InMemoryVersionTracker
from chronicles_spark.versioned_metastore import VersionedMetastore


@pytest.fixture()
def hive_table(spark, tmp_path):
    name = TableName("test", f"pv_{uuid.uuid4().hex[:8]}")
    table = TableDefinition(
        name, str(tmp_path / "pv"), PartitionSchema(("date",))
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS test")
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} (user string, n bigint) "
        "PARTITIONED BY (`date` string) STORED AS parquet "
        f"LOCATION '{table.location}'"
    )
    yield table
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _read_catalog(spark, table):
    return {
        (r["user"], r["n"], r["date"])
        for r in spark.table(str(table.name)).collect()
    }


def test_full_lifecycle_through_spark_table(spark, tmp_path, hive_table):
    table = hive_table
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    ms = SparkHiveMetastore(spark)

    # write v1 (two partitions) and sync the catalog
    df1 = spark.createDataFrame(
        [("u1", 1, "2019-01-01"), ("u2", 2, "2019-01-02")], ["user", "n", "date"]
    )
    versioned_insert_into(df1, table, tracker, "a", "v1", metastore=ms)
    assert _read_catalog(spark, table) == {
        ("u1", 1, "2019-01-01"), ("u2", 2, "2019-01-02")
    }
    first_commit = tracker.table_state(table.name).current_version

    # overwrite one partition: catalog view swaps only that partition
    df2 = spark.createDataFrame([("u9", 9, "2019-01-01")], ["user", "n", "date"])
    versioned_insert_into(df2, table, tracker, "a", "overwrite d1", metastore=ms)
    assert _read_catalog(spark, table) == {
        ("u9", 9, "2019-01-01"), ("u2", 2, "2019-01-02")
    }

    # partition-filtered catalog read prunes at the source
    plan = (
        spark.table(str(table.name))
        .where(F.col("date") == "2019-01-02")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan

    # rollback (checkout): pure metadata, catalog flips back to v1
    vm = VersionedMetastore(tracker, ms)
    vm.checkout(table, first_commit)
    assert _read_catalog(spark, table) == {
        ("u1", 1, "2019-01-01"), ("u2", 2, "2019-01-02")
    }

    # roll forward again to head state by a fresh commit on top
    df3 = spark.createDataFrame([("u5", 5, "2019-01-03")], ["user", "n", "date"])
    versioned_insert_into(df3, table, tracker, "a", "add d3", metastore=ms)
    assert ("u5", 5, "2019-01-03") in _read_catalog(spark, table)


def test_snapshot_lifecycle_through_spark_table(spark, tmp_path):
    # SnapshotTableSpec.scala:33-104: whole-table versions, latest wins,
    # rollback flips the table LOCATION pointer
    name = TableName("test", f"users_{uuid.uuid4().hex[:8]}")
    table = TableDefinition(name, str(tmp_path / "users"), PartitionSchema(()))
    spark.sql("CREATE DATABASE IF NOT EXISTS test")
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} (id bigint, email string) "
        f"STORED AS parquet LOCATION '{table.location}'"
    )
    try:
        tracker = InMemoryVersionTracker()
        tracker.init_table(table.name, is_snapshot=True, user_id="a")
        ms = SparkHiveMetastore(spark)

        v1 = spark.createDataFrame([(1, "a@x"), (2, "b@x")], ["id", "email"])
        versioned_insert_into(v1, table, tracker, "a", "v1", metastore=ms)
        first = tracker.table_state(table.name).current_version
        assert spark.table(str(name)).count() == 2

        v2 = spark.createDataFrame([(3, "c@x")], ["id", "email"])
        versioned_insert_into(v2, table, tracker, "a", "v2", metastore=ms)
        assert {r["id"] for r in spark.table(str(name)).collect()} == {3}

        VersionedMetastore(tracker, ms).checkout(table, first)
        assert {r["id"] for r in spark.table(str(name)).collect()} == {1, 2}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_multi_partition_orc_through_spark_table(spark, tmp_path):
    # MultiPartitionTableSpec.scala:22-122: two partition columns, ORC
    name = TableName("test", f"sales_{uuid.uuid4().hex[:8]}")
    table = TableDefinition(
        name, str(tmp_path / "sales"), PartitionSchema(("region", "date")),
        format="orc",
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS test")
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} (amount bigint) "
        "PARTITIONED BY (`region` string, `date` string) STORED AS orc "
        f"LOCATION '{table.location}'"
    )
    try:
        tracker = InMemoryVersionTracker()
        tracker.init_table(table.name, is_snapshot=False, user_id="a")
        ms = SparkHiveMetastore(spark)
        df = spark.createDataFrame(
            [(10, "eu", "2019-01-01"), (20, "us", "2019-01-01"), (30, "eu", "2019-01-02")],
            ["amount", "region", "date"],
        )
        versioned_insert_into(df, table, tracker, "a", "v1", metastore=ms)
        got = spark.table(str(name))
        assert got.count() == 3
        # overwrite ONE (region, date) cell
        redo = spark.createDataFrame([(99, "eu", "2019-01-01")], ["amount", "region", "date"])
        versioned_insert_into(redo, table, tracker, "a", "redo eu/d1", metastore=ms)
        assert {r["amount"] for r in spark.table(str(name)).collect()} == {99, 20, 30}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
