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
