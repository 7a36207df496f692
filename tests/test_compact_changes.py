"""Small-file compaction (new version, identical values, fewer files) and
incremental CDC-style reads (rows of exactly the partitions changed
between two commits)."""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.spark import (
    compact_partitions,
    read_changes,
    read_current,
    versioned_insert_into,
)
from chronicles_spark.spark.reader import changed_partitions, read_at_commit
from chronicles_spark.trackers import InMemoryVersionTracker


def _mk(spark, tmp_path, n_files=6):
    """Two date partitions, each fragmented into several files."""
    table = TableDefinition(
        TableName("m", "ev"), str(tmp_path / "ev"), PartitionSchema(("d",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    rows = [(i, f"u{i % 7}", float(i), f"2020-01-0{1 + i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "u", "v", "d"]).repartition(n_files)
    versioned_insert_into(df, table, tracker, "t", "v1")
    return table, tracker, df


def _data_files(table, part_dir):
    root = os.path.join(table.location, part_dir)
    vdirs = sorted(d for d in os.listdir(root) if d.startswith("_version="))
    files = {
        v: [f for f in os.listdir(os.path.join(root, v)) if f.endswith(".parquet")]
        for v in vdirs
    }
    return vdirs, files


def test_compact_reduces_files_preserves_values(spark, tmp_path):
    table, tracker, df = _mk(spark, tmp_path)
    vdirs, files = _data_files(table, "d=2020-01-01")
    assert len(vdirs) == 1 and len(files[vdirs[0]]) > 1  # fragmented before

    before = sorted((r["id"], r["u"], r["v"], r["d"])
                    for r in read_current(spark, table, tracker).collect())
    first_commit = tracker.table_state(table.name).current_version

    compact_partitions(spark, table, tracker, "t")

    after = sorted((r["id"], r["u"], r["v"], r["d"])
                   for r in read_current(spark, table, tracker).collect())
    assert after == before  # values identical

    vdirs, files = _data_files(table, "d=2020-01-01")
    assert len(vdirs) == 2  # old version untouched, new version added
    newest = vdirs[-1] if vdirs[-1] > vdirs[0] else vdirs[0]
    assert len(files[newest]) == 1  # one file per partition now

    # pre-compaction commit still time-travels to the fragmented layout
    old = read_at_commit(spark, table, tracker, first_commit)
    assert old.count() == len(before)


def test_compact_files_per_partition(spark, tmp_path):
    table, tracker, _ = _mk(spark, tmp_path)
    compact_partitions(spark, table, tracker, "t", files_per_partition=2)
    vdirs, files = _data_files(table, "d=2020-01-01")
    newest = max(vdirs)
    assert 1 <= len(files[newest]) <= 2


def test_compact_selected_partition_only(spark, tmp_path):
    from chronicles_spark.core.model import Partition

    table, tracker, _ = _mk(spark, tmp_path)
    live_before = dict(tracker.current_version(table.name).partition_versions)
    target = Partition((("d", "2020-01-01"),))

    compact_partitions(spark, table, tracker, "t", partitions=[target])

    live_after = dict(tracker.current_version(table.name).partition_versions)
    other = Partition((("d", "2020-01-02"),))
    assert live_after[other] == live_before[other]      # untouched pointer
    assert live_after[target] != live_before[target]    # fresh version


@pytest.mark.slow
def test_read_changes_incremental(spark, tmp_path):
    table, tracker, _ = _mk(spark, tmp_path)
    c1 = tracker.table_state(table.name).current_version

    # overwrite one partition, add a brand-new one
    redo = spark.createDataFrame(
        [(999, "nu", 1.5, "2020-01-01")], ["id", "u", "v", "d"]
    )
    versioned_insert_into(redo, table, tracker, "t", "redo d1")
    fresh = spark.createDataFrame(
        [(1000, "x", 2.5, "2020-01-09")], ["id", "u", "v", "d"]
    )
    versioned_insert_into(fresh, table, tracker, "t", "new d9")

    got = read_changes(spark, table, tracker, c1)
    rows = sorted((r["id"], str(r["d"])) for r in got.collect())
    assert rows == [(999, "2020-01-01"), (1000, "2020-01-09")]

    ops, _ = changed_partitions(table, tracker, c1)
    kinds = sorted(type(op).__name__ for op in ops)
    assert kinds == ["AddPartition", "UpdatePartitionVersion"]

    # from head to head: empty change set, schema intact
    head = tracker.table_state(table.name).current_version
    empty = read_changes(spark, table, tracker, head)
    assert empty.count() == 0
    assert set(c for c in empty.columns) >= {"id", "u", "v", "d"}


def test_compact_empty_selection_raises(spark, tmp_path):
    from chronicles_spark.core.model import Partition

    table, tracker, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no live partitions"):
        compact_partitions(
            spark, table, tracker, "t",
            partitions=[Partition((("d", "1999-01-01"),))],
        )


def test_compact_preserves_noncanonical_string_partition_values(spark, tmp_path):
    """A string partition value like '01' must not round-trip through int
    inference and land under a different directory (d=1)."""
    table = TableDefinition(
        TableName("m", "pad"), str(tmp_path / "pad"), PartitionSchema(("d",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    df = spark.createDataFrame([(1, "01"), (2, "002")], ["id", "d"])
    versioned_insert_into(df, table, tracker, "t", "v1")

    compact_partitions(spark, table, tracker, "t")

    live = tracker.current_version(table.name).partition_versions
    assert sorted(p.path for p in live) == ["d=002", "d=01"]  # not d=1/d=2
    got = sorted(
        (r["id"], r["d"])
        for r in read_current(
            spark, table, tracker
        ).collect()
    )
    # current view must not double-count (old pointer superseded correctly)
    assert len(got) == 2


def test_read_changes_unknown_commit_raises(spark, tmp_path):
    table, tracker, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown from_commit"):
        read_changes(spark, table, tracker, "no-such-commit")


def test_versioned_insert_scan_discovery_and_explicit_partitions(spark, tmp_path):
    """All three partition-discovery strategies commit identical ops."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.spark.writer import partition_values

    rows = [(i, f"2020-01-0{1 + i % 3}") for i in range(30)]

    def _go(mode_kwargs, name):
        t = TableDefinition(
            TableName("m", name), str(tmp_path / name), PartitionSchema(("d",))
        )
        tr = InMemoryVersionTracker()
        tr.init_table(t.name, is_snapshot=False, user_id="t")
        df = spark.createDataFrame(rows, ["id", "d"])
        versioned_insert_into(df, t, tr, "t", "v1", **mode_kwargs)
        return sorted(p.path for p in tr.current_version(t.name).partition_versions)

    df0 = spark.createDataFrame(rows, ["id", "d"])
    explicit = partition_values(df0, ("d",))
    a = _go({}, "listing")
    b = _go({"partition_discovery": "scan"}, "scan")
    c = _go({"partitions": explicit}, "explicit")
    assert a == b == c == ["d=2020-01-01", "d=2020-01-02", "d=2020-01-03"]


def test_versioned_insert_rejects_null_values_in_explicit_partitions(spark, tmp_path):
    from chronicles_spark.core.model import Partition

    table = TableDefinition(
        TableName("m", "nullexp"), str(tmp_path / "nullexp"), PartitionSchema(("d",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    df = spark.createDataFrame([(1, "x")], ["id", "d"])
    with pytest.raises(ValueError, match="concrete partition values"):
        versioned_insert_into(
            df, table, tracker, "t", "v1", partitions=[Partition((("d", ""),))]
        )


def test_partitions_written_matches_scan_on_special_values(spark, tmp_path):
    """The listing walk and the distinct scan must recover the SAME
    partition tuples, including multi-level partitions with values that
    need Hive path escaping."""
    from chronicles_spark.spark.writer import partition_values, partitions_written

    values = [
        ("2024/01:a", "x y"),     # slash, colon, space
        ("01", "=eq"),            # zero-padded, equals sign
        ("plain", "café"),        # non-ascii
        ("a%2Fb", "tab\tchar"),   # pre-escaped-looking, control char
    ]
    table = TableDefinition(
        TableName("m", "esc2"), str(tmp_path / "esc2"),
        PartitionSchema(("p1", "p2")),
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    rows = [(i, a, b) for i, (a, b) in enumerate(values)]
    df = spark.createDataFrame(rows, ["id", "p1", "p2"])

    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.writer import write_versioned

    v = generate_version()
    write_versioned(df, table, v)

    via_scan = sorted(p.path for p in partition_values(df, ("p1", "p2")))
    via_walk = sorted(p.path for p in partitions_written(table, v))
    assert via_walk == via_scan and len(via_walk) == len(values)


def test_compact_conflicts_with_concurrent_overwrite(spark, tmp_path, monkeypatch):
    """A writer overwriting a selected partition WHILE compaction rewrites it
    must fail the compaction commit — landing the rewrite would silently
    revert that partition to its pre-compaction rows.  The interleaving is
    injected by wrapping compact's read_version (called after the base head
    is captured, before the commit)."""
    import chronicles_spark.spark.compact as compact_mod
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import CommitConflictError

    table, tracker, df = _mk(spark, tmp_path)
    real_read_version = compact_mod.read_version
    hit = {"n": 0}

    def read_and_race(*args, **kwargs):
        if hit["n"] == 0:
            hit["n"] += 1
            # concurrent writer overwrites one of the selected partitions
            race = spark.createDataFrame(
                [(999, "raced", 9.9, "2020-01-01")], ["id", "u", "v", "d"]
            )
            versioned_insert_into(race, table, tracker, "w2", "racing overwrite")
        return real_read_version(*args, **kwargs)

    monkeypatch.setattr(compact_mod, "read_version", read_and_race)
    with pytest.raises(CommitConflictError):
        compact_partitions(spark, table, tracker, "t")

    # the racing writer's data survived; compaction never became visible
    live = read_current(spark, table, tracker)
    assert live.where(F.col("id") == 999).count() == 1
    # and last-writer-wins mode still allows the (dangerous) unchecked path
    monkeypatch.setattr(compact_mod, "read_version", real_read_version)
    compact_partitions(spark, table, tracker, "t", concurrency="last-writer-wins")


def test_compact_sort_by_clusters_row_groups(spark, tmp_path):
    """sort_by rewrites each partition's file with rows clustered on the
    given column (tight row-group min-max for engine-side skipping), values
    unchanged, and stats_columns re-harvests sidecars for the new version."""
    import json
    import os

    import pyarrow.parquet as pq

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.spark import (
        compact_partitions,
        read_current,
        versioned_insert_into,
    )
    from chronicles_spark.spark.reader import live_paths
    from chronicles_spark.trackers import InMemoryVersionTracker

    table = TableDefinition(
        TableName("db", "sorted"), str(tmp_path / "sorted"), PartitionSchema(("date",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(10_000), "2019-01-01") for _ in range(500)]
    df = spark.createDataFrame(rows, ["n", "date"]).repartition(8)
    versioned_insert_into(df, table, tracker, "a", "v1")

    compact_partitions(
        spark, table, tracker, "a", files_per_partition=1,
        sort_by=["n"], stats_columns="*",
    )

    [live_dir] = live_paths(table, tracker.current_version(table.name))
    files = [
        os.path.join(live_dir, f)
        for f in os.listdir(live_dir)
        if f.endswith(".parquet")
    ]
    assert len(files) == 1  # compacted to one file
    col = pq.read_table(files[0], columns=["n"])["n"].to_pylist()
    assert col == sorted(col)  # clustered
    assert sorted(col) == sorted(n for n, _ in rows)  # values unchanged

    sidecar = json.load(open(os.path.join(live_dir, "_chronicles_stats.json")))
    assert sidecar["columns"]["n"]["min"] == min(col)
    assert sidecar["columns"]["n"]["max"] == max(col)
    assert read_current(spark, table, tracker).count() == 500


def test_zorder_column_matches_python_morton(spark):
    """Differential: with injected boundaries the z-value must equal a
    pure-Python Morton (bit-interleave) reference for every (x, y)."""
    from chronicles_spark.spark import zorder_column

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    bounds = {"x": [0.5, 1.5, 2.5], "y": [0.5, 1.5, 2.5]}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_column(df, ["x", "y"], bits_per_column=2, boundaries=bounds)
        ).collect()
    }

    def morton(bx, by, bits=2, k=2):
        z = 0
        for i in range(bits):
            z |= ((bx >> i) & 1) << (i * k + 0)
            z |= ((by >> i) & 1) << (i * k + 1)
        return z

    # buckets equal the raw values under these boundaries
    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_column_quantile_path_properties(spark):
    """Default (approxQuantile) path: long-typed, in range, and monotonic
    in each dimension when the other is fixed (Morton invariant)."""
    from chronicles_spark.spark import zorder_column

    rows = [(x, y) for x in range(16) for y in range(16) for _ in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.withColumn("z", zorder_column(df, ["x", "y"], bits_per_column=4))
    data = {(r["x"], r["y"]): r["z"] for r in out.distinct().collect()}
    assert all(0 <= z < 1 << 8 for z in data.values())
    for fixed in range(16):
        xs = [data[(x, fixed)] for x in range(16)]
        ys = [data[(fixed, y)] for y in range(16)]
        assert xs == sorted(xs)
        assert ys == sorted(ys)


@pytest.mark.slow
def test_compact_zorder_clusters_both_dimensions(spark, tmp_path):
    """End-to-end: zorder_by-compacted file is ordered by the Morton code
    (verified against recomputing z from the written rows), values are
    unchanged, and sort_by+zorder_by together is rejected."""
    import random

    import pyarrow.parquet as pq

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.spark import (
        compact_partitions,
        read_current,
        versioned_insert_into,
    )
    from chronicles_spark.spark.reader import live_paths
    from chronicles_spark.trackers import InMemoryVersionTracker

    table = TableDefinition(
        TableName("db", "zorded"), str(tmp_path / "zorded"), PartitionSchema(("date",))
    )
    tracker = InMemoryVersionTracker()
    tracker.init_table(table.name, is_snapshot=False, user_id="a")
    rng = random.Random(3)
    rows = [(rng.randrange(256), rng.randrange(256), "2019-01-01") for _ in range(800)]
    versioned_insert_into(
        spark.createDataFrame(rows, ["x", "y", "date"]).repartition(8),
        table, tracker, "a", "v1",
    )

    with pytest.raises(ValueError, match="not both"):
        compact_partitions(
            spark, table, tracker, "a", sort_by=["x"], zorder_by=["x", "y"]
        )

    compact_partitions(spark, table, tracker, "a", zorder_by=["x", "y"])

    [live_dir] = live_paths(table, tracker.current_version(table.name))
    import os

    [f] = [
        os.path.join(live_dir, n)
        for n in os.listdir(live_dir)
        if n.endswith(".parquet")
    ]
    t = pq.read_table(f, columns=["x", "y"])
    xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
    assert sorted(zip(xs, ys)) == sorted((x, y) for x, y, _ in rows)  # values intact
    assert "_chronicles_zval" not in pq.read_schema(f).names  # helper col dropped

    # locality metric: along a z-order curve, ADJACENT rows are close in
    # BOTH dimensions at once.  For uniform random order the expected
    # adjacent |Δx|+|Δy| is ≈ 2·256/3 ≈ 170; sorting by one column alone
    # leaves the other at ≈ 85.  The morton curve must beat both by a wide
    # margin in the combined metric.
    adj = [
        abs(x2 - x1) + abs(y2 - y1)
        for (x1, y1), (x2, y2) in zip(zip(xs, ys), list(zip(xs, ys))[1:])
    ]
    avg = sum(adj) / len(adj)
    assert avg < 50, f"adjacent-row distance {avg:.1f} — not z-clustered"


def test_compact_preserves_user_zval_column(spark, tmp_path):
    """A user column named _chronicles_zval must survive sort_by compaction
    untouched, and zorder compaction must refuse rather than silently
    overwrite it (round-4 review finding)."""
    import pytest
    from pyspark.sql import functions as F

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.spark import compact_partitions, read_current, versioned_insert_into
    from chronicles_spark.trackers import FileBackedVersionTracker

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("db", "z"), str(tmp_path / "z"), PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="u")
    df = spark.range(6).select(
        F.col("id"),
        (F.col("id") * 10).alias("_chronicles_zval"),
        (F.col("id") % 2).cast("string").alias("d"),
    )
    versioned_insert_into(df, table, tracker, "u", "seed")

    compact_partitions(spark, table, tracker, "u", sort_by=["id"])
    got = read_current(spark, table, tracker)
    assert "_chronicles_zval" in got.columns
    assert sorted(r["_chronicles_zval"] for r in got.collect()) == [0, 10, 20, 30, 40, 50]

    with pytest.raises(ValueError, match="_chronicles_zval"):
        compact_partitions(spark, table, tracker, "u", zorder_by=["id"])
