"""Structured Streaming surface: versioned micro-batch ingest, windowed /
session aggregates (stream result == batch result on the same data), and
the applyInPandasWithState custom stateful operator."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.sources import load_table
from chronicles_spark.spark import read_current
from chronicles_spark.streaming import (
    running_user_totals_stream,
    sessionize,
    versioned_stream_sink,
    windowed_counts,
)
from chronicles_spark.trackers import InMemoryVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def events_batch(spark, tmp_path):
    """Events as a multi-file parquet dir a file-source stream can read."""
    df = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    path = str(tmp_path / "events_src")
    df.repartition(4).write.parquet(path)
    return spark.read.parquet(path), path


def _stream_from(spark, path, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # several micro-batches, not one
        .parquet(path)
    )


def _make_table(tmp_path, name="events"):
    return TableDefinition(
        TableName("stream", name),
        str(tmp_path / f"versioned_{name}"),
        PartitionSchema(("event_date",)),
    )


def test_versioned_stream_sink_overwrite_whole_partitions(spark, tmp_path, events_batch):
    batch_df, _ = events_batch
    # overwrite_partitions mode supersedes each touched partition per batch,
    # so each micro-batch must carry WHOLE partitions (date-aligned arrival);
    # repartition by the partition column makes source files date-disjoint
    src_path = str(tmp_path / "events_by_date")
    batch_df.repartition(4, "event_date").write.parquet(src_path)
    stream = _stream_from(spark, src_path, batch_df.schema)

    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path)
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    q = (
        versioned_stream_sink(
            stream, table, tracker, "etl", str(tmp_path / "ckpt"),
            mode="overwrite_partitions",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = tracker.table_state(table.name)
    commits = [u for u in state.updates if u.metadata.message.startswith("stream epoch")]
    assert len(commits) >= 2  # maxFilesPerTrigger=2 over 4 files → ≥2 epochs

    # current view sees exactly the full source data
    cur = read_current(spark, table, tracker)
    assert cur.count() == batch_df.count()
    # and the on-disk layout is versioned
    roots = os.listdir(table.location)
    assert any(d.startswith("event_date=") for d in roots)


def test_versioned_stream_sink_append_cross_batch_partitions(
    spark, tmp_path, events_batch
):
    """Default append mode: one date's rows arrive across MANY micro-batches
    (randomly partitioned source files) and the current view still holds
    every row — the silent-loss scenario of naive per-batch supersession."""
    batch_df, src_path = events_batch  # repartition(4) — dates span files

    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "append")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    stream = _stream_from(spark, src_path, batch_df.schema)
    q = (
        versioned_stream_sink(stream, table, tracker, "etl", str(tmp_path / "ckpt_a"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = tracker.table_state(table.name)
    commits = [u for u in state.updates if u.metadata.message.startswith("stream epoch")]
    assert len(commits) >= 2  # dates genuinely crossed batch boundaries

    cur = read_current(spark, table, tracker)
    assert cur.count() == batch_df.count()
    # value-level check, not just count: per-date sums match the batch input
    # (partition-column type is recovered as DATE from directory names; cast
    # back to the source's string type for the comparison)
    got = {
        r["event_date"]: round(r["s"], 6)
        for r in cur.withColumn("event_date", F.col("event_date").cast("string"))
        .groupBy("event_date")
        .agg(F.sum("value").alias("s"))
        .collect()
    }
    want = {
        r["event_date"]: round(r["s"], 6)
        for r in batch_df.groupBy("event_date").agg(F.sum("value").alias("s")).collect()
    }
    assert got == want


@pytest.mark.parametrize("backend", ["memory", "files_cas"])
def test_commit_stream_batch_replay_is_noop(spark, tmp_path, events_batch, backend):
    """Replaying an epoch (checkpoint recovery) must not double rows —
    pinned on the in-memory tracker AND the CAS-mode files tracker
    (round 6: the epoch-replay guard reads the log the CAS commit
    protocol wrote, including through a cut fold checkpoint)."""
    from chronicles_spark.streaming import commit_stream_batch
    from chronicles_spark.trackers import FileBackedVersionTracker

    batch_df, _ = events_batch
    if backend == "memory":
        tracker = InMemoryVersionTracker()
    else:
        tracker = FileBackedVersionTracker(
            str(tmp_path / "_log"), use_cas=True, checkpoint_interval=2
        )
    table = _make_table(tmp_path, "replay")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    half = batch_df.limit(40)
    commit_stream_batch(half, 0, table, tracker, "etl")
    n_commits = len(list(tracker.table_state(table.name).updates))
    n_rows = read_current(spark, table, tracker).count()

    commit_stream_batch(half, 0, table, tracker, "etl")  # replay, same epoch
    assert len(list(tracker.table_state(table.name).updates)) == n_commits
    assert read_current(spark, table, tracker).count() == n_rows

    commit_stream_batch(half, 1, table, tracker, "etl")  # new epoch appends
    assert read_current(spark, table, tracker).count() == 2 * n_rows


def test_commit_stream_batch_strict_raises_on_overlap(spark, tmp_path, events_batch):
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "strict")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    commit_stream_batch(batch_df.limit(30), 0, table, tracker, "etl", mode="strict")
    with pytest.raises(ValueError, match="strict mode"):
        # same rows again → touches partitions that already have live versions
        commit_stream_batch(batch_df.limit(30), 1, table, tracker, "etl", mode="strict")


def test_windowed_counts_stream_equals_batch(spark, tmp_path, events_batch):
    batch_df, src_path = events_batch
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_counts(batch_df).collect()
    }

    name = f"win_{uuid.uuid4().hex[:8]}"
    stream = _stream_from(spark, src_path, batch_df.schema)
    q = (
        windowed_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table(name).collect()
    }
    assert got == expected


def test_sessionize_stream_equals_batch(spark, tmp_path, events_batch):
    batch_df, src_path = events_batch
    expected = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionize(batch_df).collect()
    }

    name = f"sess_{uuid.uuid4().hex[:8]}"
    stream = _stream_from(spark, src_path, batch_df.schema)
    q = (
        sessionize(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in spark.table(name).collect()
    }
    assert got == expected


def test_running_totals_stateful(spark, tmp_path, events_batch):
    batch_df, src_path = events_batch
    expected = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in batch_df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .collect()
    }

    name = f"tot_{uuid.uuid4().hex[:8]}"
    stream = _stream_from(spark, src_path, batch_df.schema)
    q = (
        running_user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per user per batch; the LAST emission per
    # user is the final running total
    rows = spark.sql(
        f"SELECT user_id, n_events, total_value FROM {name}"
    ).collect()
    final = {}
    for r in rows:  # memory sink appends in emission order per batch
        final[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert final == {u: (n, round(t, 6)) for u, (n, t) in expected.items()}


def test_stream_dedup_exact(spark, tmp_path, events_batch):
    from chronicles_spark.streaming import stream_dedup_exact

    batch_df, _ = events_batch
    # duplicate the whole input (union with itself), write as stream source
    dup = batch_df.unionAll(batch_df)
    src = str(tmp_path / "dup_src")
    dup.repartition(4).write.parquet(src)

    name = f"dd_{uuid.uuid4().hex[:8]}"
    stream = _stream_from(spark, src, batch_df.schema)
    q = (
        stream_dedup_exact(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name)
    assert got.count() == batch_df.count()  # every duplicate dropped once
    assert got.select("event_id").distinct().count() == batch_df.count()
    # batch mode gives the same distinct id set
    assert stream_dedup_exact(dup).count() == batch_df.count()


def test_commit_stream_batch_strict_replay_is_noop(spark, tmp_path, events_batch):
    """A strict-mode replay of an already-committed epoch must be skipped,
    not raise — otherwise a crash between commit and checkpoint write
    leaves the stream in a permanent restart loop."""
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "strict_replay")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    half = batch_df.limit(30)
    commit_stream_batch(half, 0, table, tracker, "etl", mode="strict")
    n = len(list(tracker.table_state(table.name).updates))
    commit_stream_batch(half, 0, table, tracker, "etl", mode="strict")  # replay
    assert len(list(tracker.table_state(table.name).updates)) == n


def test_commit_stream_batch_strict_snapshot_raises(spark, tmp_path, events_batch):
    """strict on a snapshot table must refuse to supersede the live
    version instead of silently keeping only the last batch."""
    from chronicles_spark.core.model import PartitionSchema as PS
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = TableDefinition(
        TableName("stream", "snap"), str(tmp_path / "snap"), PS(())
    )
    tracker.init_table(table.name, is_snapshot=True, user_id="etl")

    commit_stream_batch(batch_df.limit(10), 0, table, tracker, "etl", mode="strict")
    with pytest.raises(ValueError, match="snapshot"):
        commit_stream_batch(batch_df.limit(10), 1, table, tracker, "etl", mode="strict")


def test_commit_stream_batch_epoch_regression_raises(spark, tmp_path, events_batch):
    """An epoch BEHIND the latest committed one means a wiped checkpoint is
    reusing epoch ids under the same prefix — must raise, not silently
    skip the fresh batch."""
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "regress")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    commit_stream_batch(batch_df.limit(10), 5, table, tracker, "etl")
    with pytest.raises(RuntimeError, match="behind the latest"):
        commit_stream_batch(batch_df.limit(10), 2, table, tracker, "etl")
    # a NEW prefix works (the documented fix)
    commit_stream_batch(
        batch_df.limit(10), 2, table, tracker, "etl", message_prefix="stream2"
    )


def test_epoch_cache_scans_log_once(spark, tmp_path, events_batch, monkeypatch):
    """The replay guard's full log read must happen once per sink
    (re)start, not once per micro-batch — later batches read the cached
    epoch and replay/regression semantics are unchanged."""
    from chronicles_spark.streaming import commit_stream_batch
    from chronicles_spark.streaming import ingest as ingest_mod

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "epochcache")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    calls = []
    orig = ingest_mod._latest_stream_epoch

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ingest_mod, "_latest_stream_epoch", counting)

    cache: dict = {}
    half = batch_df.limit(40)
    commit_stream_batch(half, 0, table, tracker, "etl", epoch_cache=cache)
    assert cache["latest_epoch"] == 0
    n_scans_after_first = len(calls)
    assert n_scans_after_first >= 1

    commit_stream_batch(half, 1, table, tracker, "etl", epoch_cache=cache)
    commit_stream_batch(half, 1, table, tracker, "etl", epoch_cache=cache)  # replay
    assert len(calls) == n_scans_after_first  # no further log scans
    assert cache["latest_epoch"] == 1
    assert read_current(spark, table, tracker).count() == 2 * 40

    # a stale epoch against the CACHED latest still fails loudly
    with pytest.raises(RuntimeError, match="behind the latest"):
        commit_stream_batch(half, 0, table, tracker, "etl", epoch_cache=cache)


def test_commit_stream_batch_writes_stats_sidecars(spark, tmp_path, events_batch):
    """stats_columns forwards through the sink path: every version dir the
    micro-batch created carries a data-skipping sidecar."""
    import os

    from chronicles_spark.spark.stats import STATS_FILE
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "stats_sink")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")

    commit_stream_batch(batch_df, 0, table, tracker, "etl", stats_columns="*")
    vdirs = [
        os.path.join(table.location, p, v)
        for p in os.listdir(table.location)
        if os.path.isdir(os.path.join(table.location, p))
        for v in os.listdir(os.path.join(table.location, p))
        if v.startswith("_version=")
    ]
    assert vdirs and all(
        os.path.exists(os.path.join(d, STATS_FILE)) for d in vdirs
    )


def test_epoch_cache_dropped_on_post_commit_failure(spark, tmp_path, events_batch):
    """A failure AFTER the tracker commit (e.g. metastore sync) must not
    leave a stale cached epoch: the replay of that epoch would pass the
    guard and double its rows.  The cache is invalidated on any failure so
    the retry re-derives the latest committed epoch from the log."""
    from chronicles_spark.streaming import commit_stream_batch

    batch_df, _ = events_batch
    tracker = InMemoryVersionTracker()
    table = _make_table(tmp_path, "postfail")
    tracker.init_table(table.name, is_snapshot=False, user_id="etl")
    cache: dict = {}

    half = batch_df.limit(40)
    commit_stream_batch(half, 0, table, tracker, "etl", epoch_cache=cache)
    n_rows = read_current(spark, table, tracker).count()

    class FailsAfterCommit:
        """Metastore stub whose sync raises — versioned_insert_into calls it
        after the tracker commit has already landed."""

        def current_version(self, *a, **k):
            raise RuntimeError("metastore down")

        def update(self, *a, **k):
            raise RuntimeError("metastore down")

    with pytest.raises(RuntimeError):
        commit_stream_batch(
            half, 1, table, tracker, "etl",
            metastore=FailsAfterCommit(), epoch_cache=cache,
        )
    assert "latest_epoch" not in cache  # stale epoch-0 entry dropped
    committed = read_current(spark, table, tracker).count()

    # Spark replays epoch 1 (no metastore this time): the guard re-scans the
    # log, sees epoch 1 committed, and skips — rows must not double
    commit_stream_batch(half, 1, table, tracker, "etl", epoch_cache=cache)
    assert read_current(spark, table, tracker).count() == committed == 2 * n_rows
