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
from chronicles_spark.glue import FakeGlueClient, GlueMetastore
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


@pytest.fixture(params=["memory", "hive", "glue"])
def rig(request, spark, tmp_path):
    """(metastore, make_snapshot_table, make_partitioned_table) triple.

    For Hive, the make_* callables issue the reference's CREATE EXTERNAL
    TABLE DDL (SparkHiveMetastoreSpec.scala:88-110) against the session
    catalog; tables get unique names so tests are independent.  For Glue,
    the same suite runs against GlueMetastore over the dict-backed
    boto3-shaped FakeGlueClient (page_size=2 so multi-partition listings
    exercise the NextToken pagination loop) — the sandbox-testable stand-in
    for GlueMetastoreIntegrationSpec.scala:26-79.
    """
    suffix = uuid.uuid4().hex[:8]

    if request.param == "glue":
        client = FakeGlueClient(page_size=2)
        ms = GlueMetastore(client)

        def make_snapshot():
            table = TableDefinition(
                TableName("test", f"users_{suffix}"),
                str(tmp_path / "users"),
                PartitionSchema(()),
            )
            client.create_table(
                DatabaseName="test",
                TableInput={
                    "Name": table.name.name,
                    "StorageDescriptor": {
                        "Location": table.location,
                        "InputFormat": "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
                        "OutputFormat": "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat",
                        "SerdeInfo": {
                            "SerializationLibrary": "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
                        },
                    },
                },
            )
            return table

        def make_partitioned():
            table = TableDefinition(
                TableName("test", f"clicks_{suffix}"),
                str(tmp_path / "clicks"),
                PartitionSchema(("date",)),
            )
            client.create_table(
                DatabaseName="test",
                TableInput={
                    "Name": table.name.name,
                    "StorageDescriptor": {"Location": table.location},
                    "PartitionKeys": [{"Name": "date", "Type": "string"}],
                },
            )
            return table

        yield ms, make_snapshot, make_partitioned
        return

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


# -- Glue-specific behaviour (M11 + the documented deviations) --------------


def test_glue_extract_format_params():
    """M11 (GlueMetastore.scala:179-188): only serde library and
    input/output formats survive; location/columns/stats never leak into
    per-partition descriptors."""
    from chronicles_spark.glue import extract_format_params

    sd = {
        "Location": "s3://bucket/t",
        "Columns": [{"Name": "id", "Type": "string"}],
        "InputFormat": "in.Format",
        "OutputFormat": "out.Format",
        "SerdeInfo": {"SerializationLibrary": "serde.Lib", "Parameters": {"x": "1"}},
        "NumberOfBuckets": 4,
    }
    assert extract_format_params(sd) == {
        "InputFormat": "in.Format",
        "OutputFormat": "out.Format",
        "SerdeInfo": {"SerializationLibrary": "serde.Lib"},
    }
    assert extract_format_params({}) == {}


def test_glue_partition_locations_are_versioned(tmp_path):
    """The swap primitive leaves the partition StorageDescriptor at
    <table>/<partition>/_version=<label> — the reference's addPartition
    concatenation bug (GlueMetastore.scala:82-87) is deliberately NOT
    reproduced."""
    client = FakeGlueClient()
    ms = GlueMetastore(client)
    table = TableDefinition(
        TableName("db", "clicks"), str(tmp_path / "clicks"), PartitionSchema(("date",))
    )
    client.create_table(
        DatabaseName="db",
        TableInput={
            "Name": "clicks",
            "StorageDescriptor": {"Location": table.location},
            "PartitionKeys": [{"Name": "date", "Type": "string"}],
        },
    )
    v = generate_version()
    ms.add_partition(table, _part("2019-03-01"), v)
    loc = client.get_partitions(DatabaseName="db", TableName="clicks")["Partitions"][
        0
    ]["StorageDescriptor"]["Location"]
    assert loc.endswith(f"date=2019-03-01/_version={v.label}")
    # idempotent re-add (Hive ADD IF NOT EXISTS semantics) keeps v1
    ms.add_partition(table, _part("2019-03-01"), generate_version())
    loc2 = client.get_partitions(DatabaseName="db", TableName="clicks")[
        "Partitions"
    ][0]["StorageDescriptor"]["Location"]
    assert loc2 == loc


def test_glue_update_table_version_preserves_partition_keys(tmp_path):
    """Deviation #2: UpdateTable REPLACES the catalog entry in real Glue,
    so the snapshot swap must carry PartitionKeys/Parameters forward."""
    client = FakeGlueClient()
    ms = GlueMetastore(client)
    table = TableDefinition(
        TableName("db", "users"), str(tmp_path / "users"), PartitionSchema(())
    )
    client.create_table(
        DatabaseName="db",
        TableInput={
            "Name": "users",
            "StorageDescriptor": {"Location": table.location},
            "Parameters": {"classification": "parquet"},
        },
    )
    v = generate_version()
    ms.update_table_version(table, v)
    after = client.get_table(DatabaseName="db", Name="users")["Table"]
    assert after["StorageDescriptor"]["Location"].endswith(f"_version={v.label}")
    assert after["Parameters"] == {"classification": "parquet"}
    # a second swap strips the previous _version suffix before re-versioning
    v2 = generate_version()
    ms.update_table_version(table, v2)
    loc = client.get_table(DatabaseName="db", Name="users")["Table"][
        "StorageDescriptor"
    ]["Location"]
    assert loc.endswith(f"_version={v2.label}") and v.label not in loc


def test_glue_versioned_metastore_commit_and_checkout(tmp_path):
    """End-to-end V9/V10 over Glue: tracker commit → fold → diff → catalog
    sync, then rollback — the sandbox twin of
    GlueMetastoreIntegrationSpec.scala:26-79."""
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    client = FakeGlueClient(page_size=1)
    ms = GlueMetastore(client)
    tracker = FileBackedVersionTracker(str(tmp_path / "log"))
    table = TableDefinition(
        TableName("db", "clicks"), str(tmp_path / "clicks"), PartitionSchema(("date",))
    )
    client.create_table(
        DatabaseName="db",
        TableInput={
            "Name": "clicks",
            "StorageDescriptor": {"Location": table.location},
            "PartitionKeys": [{"Name": "date", "Type": "string"}],
        },
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    vm = VersionedMetastore(tracker, ms)

    v1, v2 = generate_version(), generate_version()
    vm.commit(
        table,
        TableUpdate(
            TableUpdateMetadata.new("t", "v1"),
            (
                AddPartitionVersion(_part("2019-03-01"), v1),
                AddPartitionVersion(_part("2019-03-02"), v1),
            ),
        ),
    )
    first = tracker.table_state(table.name).current_version
    vm.commit(
        table,
        TableUpdate(
            TableUpdateMetadata.new("t", "v2"),
            (AddPartitionVersion(_part("2019-03-02"), v2),),
        ),
    )
    assert ms.current_version(table) == PartitionedTableVersion(
        {_part("2019-03-01"): v1, _part("2019-03-02"): v2}
    )
    vm.checkout(table, first)  # rollback: catalog pointers move, no data
    assert ms.current_version(table) == PartitionedTableVersion(
        {_part("2019-03-01"): v1, _part("2019-03-02"): v1}
    )
