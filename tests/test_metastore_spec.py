"""Black-box Metastore behavior suite, parametrized over implementations.

Port of the reference's shared spec
(core/src/test/scala/dev/chronicles/core/MetastoreSpec.scala:17-196),
instantiated against both InMemoryMetastore and the real SparkHiveMetastore
on a Hive-enabled session (mirroring
spark/src/test/scala/dev/chronicles/spark/SparkHiveMetastoreSpec.scala:23-29
and the SparkHiveSuite rig). The Hive variant exercises the actual DDL:
CREATE EXTERNAL TABLE, ALTER TABLE ADD/SET LOCATION/DROP PARTITION,
SHOW PARTITIONS and DESCRIBE FORMATTED parsing.
"""

from __future__ import annotations

import uuid

import pytest

from chronicles_spark.core.model import (
    Partition,
    PartitionedTableVersion,
    PartitionSchema,
    SnapshotTableVersion,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.version import UNVERSIONED, generate_version
from chronicles_spark.core.diff import (
    AddPartition,
    RemovePartitionOp,
    UpdatePartitionVersion,
    UpdateTableVersion,
)
from chronicles_spark.spark.metastore import InMemoryMetastore, SparkHiveMetastore


def _part(date: str) -> Partition:
    return Partition((("date", date),))


def _materialize(table: TableDefinition, *ops) -> None:
    """Create the version directories an op points at — Spark's ALTER ...
    SET LOCATION validates path existence, and in the real flow the writer
    has always written data there before the metastore swap."""
    from pathlib import Path

    from chronicles_spark.core import paths as vpaths

    for op in ops:
        if isinstance(op, (AddPartition, UpdatePartitionVersion)):
            base = op.partition.resolve_path(table.location)
            Path(vpaths.path_for(base, op.version)).mkdir(parents=True, exist_ok=True)
        elif isinstance(op, UpdateTableVersion):
            Path(vpaths.path_for(table.location, op.version)).mkdir(
                parents=True, exist_ok=True
            )


@pytest.fixture(params=["memory", "hive"])
def rig(request, spark, tmp_path):
    """(metastore, make_snapshot_table, make_partitioned_table) triple.

    For Hive, the make_* callables issue the reference's CREATE EXTERNAL
    TABLE DDL (SparkHiveMetastoreSpec.scala:88-110) against the session
    catalog; tables get unique names so tests are independent.
    """
    suffix = uuid.uuid4().hex[:8]

    if request.param == "memory":
        ms = InMemoryMetastore()

        def make_snapshot():
            table = TableDefinition(
                TableName("test", f"users_{suffix}"),
                str(tmp_path / "users"),
                PartitionSchema(()),
            )
            ms.create_table(table)
            return table

        def make_partitioned():
            table = TableDefinition(
                TableName("test", f"clicks_{suffix}"),
                str(tmp_path / "clicks"),
                PartitionSchema(("date",)),
            )
            ms.create_table(table)
            return table

        yield ms, make_snapshot, make_partitioned
        return

    spark.sql("CREATE DATABASE IF NOT EXISTS test")
    ms = SparkHiveMetastore(spark)
    created = []

    def make_snapshot():
        table = TableDefinition(
            TableName("test", f"users_{suffix}"),
            str(tmp_path / "users"),
            PartitionSchema(()),
        )
        spark.sql(
            f"CREATE EXTERNAL TABLE IF NOT EXISTS {table.name} "
            "(id string, name string, email string) STORED AS parquet "
            f"LOCATION '{table.location}'"
        )
        created.append(table.name)
        return table

    def make_partitioned():
        table = TableDefinition(
            TableName("test", f"clicks_{suffix}"),
            str(tmp_path / "clicks"),
            PartitionSchema(("date",)),
        )
        spark.sql(
            f"CREATE EXTERNAL TABLE IF NOT EXISTS {table.name} "
            "(id string, path string, ts timestamp) "
            "PARTITIONED BY (`date` string) STORED AS parquet "
            f"LOCATION '{table.location}'"
        )
        created.append(table.name)
        return table

    yield ms, make_snapshot, make_partitioned
    for name in created:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _update(ms, table, ops):
    _materialize(table, *ops)
    ms.update(table, ops)


def test_snapshot_table_version_update_and_revert(rig):
    """MetastoreSpec.scala:23-56 — update twice then revert."""
    ms, make_snapshot, _ = rig
    table = make_snapshot()

    assert ms.current_version(table) == SnapshotTableVersion(UNVERSIONED)

    v1 = generate_version()
    _update(ms, table, [UpdateTableVersion(v1)])
    assert ms.current_version(table) == SnapshotTableVersion(v1)

    v2 = generate_version()
    _update(ms, table, [UpdateTableVersion(v2)])
    assert ms.current_version(table) == SnapshotTableVersion(v2)

    _update(ms, table, [UpdateTableVersion(v1)])  # revert
    assert ms.current_version(table) == SnapshotTableVersion(v1)


def test_partitioned_table_add_update_remove(rig):
    """MetastoreSpec.scala:67-157 — the full partition lifecycle."""
    ms, _, make_partitioned = rig
    table = make_partitioned()

    assert ms.current_version(table) == PartitionedTableVersion({})

    v1 = generate_version()
    _update(
        ms,
        table,
        [
            AddPartition(_part("2019-03-01"), UNVERSIONED),
            AddPartition(_part("2019-03-02"), v1),
            AddPartition(_part("2019-03-03"), v1),
        ],
    )
    assert ms.current_version(table) == PartitionedTableVersion(
        {
            _part("2019-03-01"): UNVERSIONED,
            _part("2019-03-02"): v1,
            _part("2019-03-03"): v1,
        }
    )

    v2 = generate_version()
    _update(
        ms,
        table,
        [
            UpdatePartitionVersion(_part("2019-03-01"), v1),
            UpdatePartitionVersion(_part("2019-03-03"), v2),
        ],
    )
    assert ms.current_version(table) == PartitionedTableVersion(
        {
            _part("2019-03-01"): v1,
            _part("2019-03-02"): v1,
            _part("2019-03-03"): v2,
        }
    )

    _update(ms, table, [RemovePartitionOp(_part("2019-03-02"))])
    assert ms.current_version(table) == PartitionedTableVersion(
        {
            _part("2019-03-01"): v1,
            _part("2019-03-03"): v2,
        }
    )


def test_unknown_table_errors(rig):
    """MetastoreSpec.scala:159-170 — version of an unknown table errors."""
    ms, _, make_partitioned = rig
    make_partitioned()
    unknown = TableDefinition(
        TableName("unknown", "table"), "/nowhere", PartitionSchema(("date",))
    )
    with pytest.raises(Exception):
        ms.current_version(unknown)


def test_update_unknown_partition_fails_and_leaves_state(rig):
    """MetastoreSpec.scala:172-196 — a failed update leaves state unchanged."""
    ms, _, make_partitioned = rig
    table = make_partitioned()
    initial = ms.current_version(table)

    with pytest.raises(Exception):
        ms.update(
            table, [UpdatePartitionVersion(_part("2019-03-01"), generate_version())]
        )

    assert ms.current_version(table) == initial


def test_hive_partition_locations_point_at_versioned_paths(rig):
    """The swap primitive must leave the LOCATION pointer at
    <table>/<partition>/_version=<label> (SparkHiveMetastore.scala:70-82)."""
    ms, _, make_partitioned = rig
    if not isinstance(ms, SparkHiveMetastore):
        pytest.skip("location assertion is Hive-specific")
    table = make_partitioned()

    v1 = generate_version()
    _update(ms, table, [AddPartition(_part("2019-04-01"), v1)])
    loc = ms._partition_location(str(table.name), _part("2019-04-01"))
    assert loc.endswith(f"date=2019-04-01/_version={v1.label}")

    v2 = generate_version()
    _update(ms, table, [UpdatePartitionVersion(_part("2019-04-01"), v2)])
    loc = ms._partition_location(str(table.name), _part("2019-04-01"))
    assert loc.endswith(f"date=2019-04-01/_version={v2.label}")


def test_hive_is_partitioned(rig):
    """M9 via the catalog API (SURVEY §7 risk 2)."""
    ms, make_snapshot, make_partitioned = rig
    if not isinstance(ms, SparkHiveMetastore):
        pytest.skip("catalog probe is Hive-specific")
    snap, part = make_snapshot(), make_partitioned()
    assert ms.is_partitioned(str(part.name)) is True
    assert ms.is_partitioned(str(snap.name)) is False


def test_hive_find_table_location(rig):
    """M7: DESCRIBE FORMATTED → Location row (SparkHiveMetastore.scala:114-126)."""
    ms, make_snapshot, _ = rig
    if not isinstance(ms, SparkHiveMetastore):
        pytest.skip("DESCRIBE parsing is Hive-specific")
    snap = make_snapshot()
    loc = ms._table_location(str(snap.name))
    assert loc.replace("file:", "") == snap.location

    v = generate_version()
    _materialize(snap, UpdateTableVersion(v))
    _update(ms, snap, [UpdateTableVersion(v)])
    loc2 = ms._table_location(str(snap.name))
    assert loc2.endswith(f"_version={v.label}")


def test_hive_show_partitions_listing(rig):
    """M8: SHOW PARTITIONS surfaces exactly the registered partitions, with
    escaped directory fragments mapped back to raw values."""
    ms, _, make_partitioned = rig
    if not isinstance(ms, SparkHiveMetastore):
        pytest.skip("SHOW PARTITIONS is Hive-specific")
    table = make_partitioned()
    v = generate_version()
    _update(
        ms, table,
        [AddPartition(_part("2019-05-01"), v), AddPartition(_part("2019-05-02"), v)],
    )
    tv = ms.current_version(table)
    assert {p.path for p in tv.partition_versions} == {
        "date=2019-05-01", "date=2019-05-02",
    }
