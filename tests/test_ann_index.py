"""Materialized IVF/PQ index (operators/ann_index.py): build → versioned
table partitioned by bucket; search prunes probes at the SCAN.

The correctness anchor is equality with the in-memory ivfpq_topk under
identical injected artifacts (itself numpy-differentialed in test_pq.py);
the SCALE anchor is the input-file audit — a probe read's files must lie
entirely under the probed buckets' live directories.
"""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import ann_index as AX, similarity as SIM
from chronicles_spark.sources import load_table
from chronicles_spark.trackers import FileBackedVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

N_CLUSTERS, M, K_SUB, ITERS = 4, 4, 4, 2


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ann_index")
    tracker = FileBackedVersionTracker(str(tmp / "_log"))
    table = TableDefinition(
        TableName("demo", "ann"), str(tmp / "ann"), PartitionSchema(("bucket",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    state, artifacts = AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB,
        iters=ITERS,
    )
    return emb, table, tracker, state, artifacts


def _queries(emb):
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def test_build_writes_versioned_buckets_and_artifacts(built):
    emb, table, tracker, state, artifacts = built
    buckets = {
        dict(p.column_values)["bucket"]
        for p in state.partition_versions.keys()
    }
    assert buckets <= {str(i) for i in range(N_CLUSTERS)} and buckets
    labels = {v.label for v in state.partition_versions.values()}
    assert labels == {artifacts.version_label}
    # sidecar exists and round-trips
    loaded = AX.load_ann_artifacts(table, state)
    assert loaded == artifacts
    assert len(loaded.centroid_list) == N_CLUSTERS
    assert len(loaded.codebook_list) == M


def test_indexed_search_equals_in_memory_ivfpq(spark, built):
    emb, table, tracker, state, artifacts = built
    q = _queries(emb)
    for n_probe in (1, 2, N_CLUSTERS):
        got = sorted(map(tuple, AX.ivfpq_topk_indexed(
            spark, table, tracker, q, k=3, n_probe=n_probe
        ).collect()))
        want = sorted(map(tuple, SIM.ivfpq_topk(
            emb, q, k=3, n_probe=n_probe,
            centroids=artifacts.centroid_list,
            codebooks=artifacts.codebook_list,
        ).collect()))
        assert got == want and got


def test_probe_read_prunes_at_the_scan(spark, built):
    """THE scale claim: with n_probe=1 the search's parquet inputs lie
    entirely under the probed buckets' live directories — unprobed
    buckets are never read."""
    emb, table, tracker, state, artifacts = built
    q = _queries(emb).limit(1)
    res = AX.ivfpq_topk_indexed(spark, table, tracker, q, k=3, n_probe=1)
    probes = SIM.select_probes(q, artifacts.centroid_list, 1)
    probed = [r["bucket"] for r in probes.select("bucket").distinct().collect()]
    assert len(probed) == 1
    allowed = AX.probed_bucket_paths(table, state, probed)
    assert len(allowed) == 1
    def _strip(uri):  # inputFiles() returns file:// URIs
        return uri.removeprefix("file://")

    index_files = [
        _strip(f) for f in res.inputFiles() if table.location in _strip(f)
    ]
    assert index_files  # the index was actually read from disk
    for f in index_files:
        assert any(f.startswith(a) for a in allowed), (f, allowed)
    # and the full path list for all buckets is strictly larger
    all_paths = AX.probed_bucket_paths(
        table, state, [str(i) for i in range(N_CLUSTERS)]
    )
    assert len(all_paths) > len(allowed)


def test_rebuild_supersedes_and_rollback_restores(spark, built):
    """An index rebuild is an ordinary commit: the new artifacts+data are
    live, and checkout returns to the previous index atomically."""
    emb, table, tracker, state, artifacts = built
    head_before = tracker.table_state(table.name).current_version
    state2, artifacts2 = AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB,
        iters=1, message="rebuild",
    )
    assert artifacts2.version_label != artifacts.version_label
    assert AX.load_ann_artifacts(table, state2) == artifacts2
    q = _queries(emb)
    r2 = AX.ivfpq_topk_indexed(spark, table, tracker, q, k=3, n_probe=2)
    assert r2.count() == 9  # 3 queries x 3 ranks
    # rollback: the OLD artifacts resolve again
    tracker.set_current_version(table.name, head_before)
    restored = tracker.current_version(table.name)
    assert AX.load_ann_artifacts(table, restored) == artifacts
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=3, n_probe=2
    ).collect()))
    want = sorted(map(tuple, SIM.ivfpq_topk(
        emb, q, k=3, n_probe=2,
        centroids=artifacts.centroid_list,
        codebooks=artifacts.codebook_list,
    ).collect()))
    assert got == want


def test_injected_artifacts_reencode_without_refit(spark, built):
    emb, table, tracker, state, artifacts = built
    _, a2 = AX.build_ann_index(
        emb, table, tracker,
        centroids=artifacts.centroid_list,
        codebooks=artifacts.codebook_list,
        message="re-encode",
    )
    assert a2.centroids == artifacts.centroids
    assert a2.codebooks == artifacts.codebooks
    assert a2.version_label != artifacts.version_label


def test_guards(spark, built, tmp_path):
    emb, table, tracker, state, artifacts = built
    bad = TableDefinition(
        TableName("demo", "bad"), str(tmp_path / "bad"), PartitionSchema(("d",))
    )
    with pytest.raises(ValueError, match="partitioned by"):
        AX.build_ann_index(emb, bad, tracker)
    # mixed-version state refuses auto artifact resolution
    from chronicles_spark.core.model import PartitionedTableVersion
    from chronicles_spark.core.version import generate_version

    pv = dict(state.partition_versions)
    assert len(pv) >= 2
    k0 = next(iter(pv))
    mixed = PartitionedTableVersion({**pv, k0: generate_version()})
    with pytest.raises(ValueError, match="no artifact sidecar"):
        AX.load_ann_artifacts(table, mixed)
    with pytest.raises(ValueError, match="no live index data"):
        AX.load_ann_artifacts(table, PartitionedTableVersion({}))
    # but explicit artifacts still search a mixed table (contract)
    q = _queries(emb)
    res = AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=2, n_probe=2, artifacts=artifacts
    )
    assert res.count() == 6


def test_extend_upserts_new_vectors_and_matches_full_build(spark, tmp_path):
    """Build on half the corpus, extend with the other half: the indexed
    search over the extended index must equal the in-memory ivfpq over
    the FULL corpus under the same artifacts."""
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annx"), str(tmp_path / "annx"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    first = emb.where(F.col("vec_id") < 25)
    rest = emb.where(F.col("vec_id") >= 25)
    # fit artifacts on the FULL corpus so both halves share the geometry
    cents = SIM.kmeans_fit(emb, N_CLUSTERS, ITERS)
    books = SIM.pq_fit(emb, m=M, k_sub=K_SUB, iters=ITERS)
    _, arts = AX.build_ann_index(
        first, table, tracker, centroids=cents, codebooks=books
    )
    state2, arts2 = AX.extend_ann_index(rest, table, tracker)
    assert arts2.centroids == arts.centroids
    assert arts2.codebooks == arts.codebooks
    # mixed labels now live — auto artifact resolution must still work
    resolved = AX.load_ann_artifacts(table, state2)
    assert resolved.centroids == arts.centroids

    q = _queries(emb)
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=3, n_probe=2
    ).collect()))
    want = sorted(map(tuple, SIM.ivfpq_topk(
        emb, q, k=3, n_probe=2, centroids=cents, codebooks=books
    ).collect()))
    assert got == want and got


@pytest.mark.slow
def test_extend_replaces_same_id_and_keeps_untouched_buckets(spark, tmp_path):
    from chronicles_spark.spark import read_current

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annu"), str(tmp_path / "annu"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    state1, arts = AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB,
        iters=ITERS,
    )
    n_before = read_current(spark, table, tracker).count()

    # re-submit ONE existing id with a different embedding (another row's
    # vector): upsert — total count unchanged, codes now that vector's,
    # and the STALE row is removed from its OLD bucket even though the
    # new embedding assigns to a different bucket (the moved-upsert case)
    before = read_current(spark, table, tracker)
    old_bucket = str(
        before.where(F.col("vec_id") == 0).collect()[0]["bucket"]
    )
    donor = emb.where(F.col("vec_id") == 7).select("embedding").collect()[0]
    changed = spark.createDataFrame(
        [(0, list(donor["embedding"]))], "vec_id long, embedding array<float>"
    )
    state2, _ = AX.extend_ann_index(changed, table, tracker)
    after = read_current(spark, table, tracker)
    assert after.count() == n_before
    assert after.where(F.col("vec_id") == 0).count() == 1  # no stale twin
    codes = {
        r["vec_id"]: (r["bucket"], list(r["pq_codes"]))
        for r in after.where(F.col("vec_id").isin(0, 7)).collect()
    }
    assert codes[0] == codes[7]  # id 0 now carries id 7's encoding

    # exactly the new bucket + the old bucket were republished; every
    # other bucket keeps its original version
    new_bucket = str(codes[0][0])
    assert new_bucket != old_bucket  # the fixture really exercises a move
    for p, v in state2.partition_versions.items():
        b = dict(p.column_values)["bucket"]
        if b in (new_bucket, old_bucket):
            assert v.label != arts.version_label
        else:
            assert v.label == arts.version_label

    # disagreeing sidecar (different quantizer) must refuse auto-load
    import json as _json

    bad_label = [
        v.label for v in state2.partition_versions.values()
        if v.label != arts.version_label
    ][0]
    fs, apath = AX._artifact_path(table, bad_label)
    doc = _json.loads(fs.read_text(apath))
    doc["centroids"][0][1][0] += 1.0
    fs.write_text(apath, _json.dumps(doc))
    with pytest.raises(ValueError, match="DIFFERENT quantizers"):
        AX.load_ann_artifacts(table, state2)

    # the empty batch ALSO trips artifact validation's degraded path
    # (dims can't be probed on zero rows) — assert the warning
    # deliberately so a real regression can't hide inside it
    with pytest.warns(RuntimeWarning, match="cannot be validated"), \
            pytest.raises(ValueError, match="empty batch"):
        AX.extend_ann_index(emb.limit(0), table, tracker, artifacts=arts)


def test_extend_removes_emptied_bucket_from_live_view(spark, tmp_path):
    """A moved upsert can empty its old bucket; the commit must carry a
    RemovePartition for it, or the bucket's OLD version directory would
    stay live and resurrect the moved row."""
    from chronicles_spark.spark import read_current

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "anne"), str(tmp_path / "anne"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    # controlled geometry: 2 coarse buckets far apart, dim 4, m=2
    cents = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [10.0, 10.0, 10.0, 10.0])]
    books = [
        [[0.0, 0.0], [10.0, 10.0]],
        [[0.0, 0.0], [10.0, 10.0]],
    ]
    corpus = spark.createDataFrame(
        [
            (1, [0.1, 0.0, 0.0, 0.0]),   # bucket 0
            (2, [0.0, 0.2, 0.0, 0.0]),   # bucket 0
            (3, [10.0, 10.0, 10.0, 9.9]) # bucket 1 — its ONLY member
        ],
        "vec_id long, embedding array<float>",
    )
    state1, arts = AX.build_ann_index(
        corpus, table, tracker, centroids=cents, codebooks=books
    )
    assert len(state1.partition_versions) == 2

    # move vector 3 near the origin: bucket 1 empties
    moved = spark.createDataFrame(
        [(3, [0.0, 0.0, 0.3, 0.0])], "vec_id long, embedding array<float>"
    )
    state2, _ = AX.extend_ann_index(moved, table, tracker)
    live_buckets = {
        dict(p.column_values)["bucket"] for p in state2.partition_versions
    }
    assert live_buckets == {"0"}  # bucket 1 removed from the live view
    rows = {
        r["vec_id"]: r["bucket"]
        for r in read_current(spark, table, tracker).collect()
    }
    assert rows == {1: 0, 2: 0, 3: 0}  # no resurrected stale row

    # append mode skips the locate scan — duplicate contract is caller's
    dup = spark.createDataFrame(
        [(9, [0.0, 0.0, 0.0, 0.4])], "vec_id long, embedding array<float>"
    )
    AX.extend_ann_index(dup, table, tracker, mode="append")
    assert read_current(spark, table, tracker).count() == 4
    with pytest.raises(ValueError, match="mode"):
        AX.extend_ann_index(dup, table, tracker, mode="merge")


@pytest.mark.slow
def test_random_extend_sequence_equals_fresh_build(spark, tmp_path):
    """Seeded fuzz differential: after a random sequence of extends
    (fresh ids, re-submitted ids with changed embeddings), the index
    CONTENT equals a from-scratch build of the final corpus under the
    same artifacts — the upsert algebra converges to set semantics."""
    import random

    from chronicles_spark.spark import read_current

    rng = random.Random(42)
    dim = 8
    cents = [(i, [float(10 * i)] * dim) for i in range(3)]
    books = [[[float(5 * c)] * 4 for c in range(3)] for _ in range(2)]

    def vec():
        base = rng.choice([0.0, 10.0, 20.0])
        return [base + rng.uniform(-2, 2) for _ in range(dim)]

    corpus = {i: vec() for i in range(12)}
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annf"), str(tmp_path / "annf"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")

    def df_of(d):
        return spark.createDataFrame(
            [(i, v) for i, v in sorted(d.items())],
            "vec_id long, embedding array<float>",
        )

    AX.build_ann_index(df_of(corpus), table, tracker,
                       centroids=cents, codebooks=books)
    next_id = 12
    for _ in range(4):
        batch = {}
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5 and corpus:
                i = rng.choice(sorted(corpus))  # re-submit, new embedding
            else:
                i, next_id = next_id, next_id + 1
            batch[i] = vec()
        corpus.update(batch)
        AX.extend_ann_index(df_of(batch), table, tracker)

    got = {
        (r["vec_id"], r["bucket"], tuple(r["pq_codes"]))
        for r in read_current(spark, table, tracker).collect()
    }
    # reference: a fresh build of the FINAL corpus, same artifacts
    t2 = FileBackedVersionTracker(str(tmp_path / "_log2"))
    table2 = TableDefinition(
        TableName("demo", "annf2"), str(tmp_path / "annf2"),
        PartitionSchema(("bucket",)),
    )
    t2.init_table(table2.name, is_snapshot=False, user_id="t")
    AX.build_ann_index(df_of(corpus), table2, t2,
                       centroids=cents, codebooks=books)
    want = {
        (r["vec_id"], r["bucket"], tuple(r["pq_codes"]))
        for r in read_current(spark, table2, t2).collect()
    }
    assert got == want and len(got) == len(corpus)


def test_search_ann_index_composes_index_and_refine(spark, built):
    """One-call recipe: scan-pruned shortlist + exact re-rank must equal
    running the two stages by hand."""
    emb, table, tracker, state, artifacts = built
    q = _queries(emb)
    got = sorted(map(tuple, AX.search_ann_index(
        spark, table, tracker, q, emb, k=3, shortlist_k=8, n_probe=2,
    ).collect()))
    short = AX.ivfpq_topk_indexed(spark, table, tracker, q, k=8, n_probe=2)
    want = sorted(map(tuple, SIM.rerank_topk(
        short, emb, q, k=3, metric="cosine"
    ).collect()))
    assert got == want and len(got) == 9
    with pytest.raises(ValueError, match="shortlist_k"):
        AX.search_ann_index(spark, table, tracker, q, emb, k=9, shortlist_k=3)


def test_vacuum_ann_artifacts_follows_data_vacuum(spark, tmp_path):
    """Sidecar GC mirrors storage truth: live/retained labels keep their
    sidecars; a label whose data vacuum reclaimed loses its sidecar; a
    commit-less orphan sidecar waits out the age guard."""
    from datetime import timedelta

    from chronicles_spark.spark import vacuum

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annv"), str(tmp_path / "annv"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    _, a1 = AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB, iters=1
    )
    _, a2 = AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB, iters=2,
        message="rebuild",
    )
    fs, p1 = AX._artifact_path(table, a1.version_label)
    _, p2 = AX._artifact_path(table, a2.version_label)

    # before any data vacuum: both labels' data exist → nothing doomed
    assert AX.vacuum_ann_artifacts(table, tracker, dry_run=True) == []

    # vacuum the superseded build's data, then the sweep reclaims exactly
    # its sidecar (dry run first — no deletion)
    removed = vacuum(table, tracker, keep_last=1)
    assert removed  # the superseded version's dirs really went away
    doomed = AX.vacuum_ann_artifacts(table, tracker, dry_run=True)
    assert doomed == [p1] and fs.exists(p1)
    assert AX.vacuum_ann_artifacts(table, tracker) == [p1]
    assert not fs.exists(p1) and fs.exists(p2)
    # the live index still resolves its artifacts
    assert AX.load_ann_artifacts(
        table, tracker.current_version(table.name)
    ) == a2

    # crashed-build orphan: sidecar without any commit — age-guarded
    fs.write_text(
        fs.join(*p1.rsplit("/", 1)[:1]) + "/"
        + AX.ARTIFACT_PREFIX + "20200101-000000.000000000-"
        + "0" * 8 + "-0000-0000-0000-" + "0" * 12 + ".json",
        a1.to_json(),
    )
    assert AX.vacuum_ann_artifacts(
        table, tracker, dry_run=True, orphan_min_age=timedelta(days=7)
    ) == []  # too young (mtime is now)
    aged = AX.vacuum_ann_artifacts(
        table, tracker, orphan_min_age=timedelta(seconds=-1)
    )
    assert len(aged) == 1 and aged[0].endswith(
        "-000000000000.json"
    )  # exactly the crashed-build orphan; the live sidecar survives
    assert fs.exists(p2)


@pytest.mark.slow
def test_extend_optimistic_conflict_on_racing_commit(spark, tmp_path, monkeypatch):
    """An extend is a read-modify-write: a racer committing to one of ITS
    buckets between write and commit must raise CommitConflictError
    (default optimistic), while a racer on a DISJOINT bucket auto-merges
    and last-writer-wins opts back out entirely."""
    import chronicles_spark.spark.writer as writer_mod
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        RemovePartition, TableUpdate, TableUpdateMetadata,
    )
    from chronicles_spark.trackers.base import CommitConflictError

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annc"), str(tmp_path / "annc"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    cents = [(0, [0.0] * 4), (1, [10.0] * 4)]
    books = [[[0.0, 0.0], [10.0, 10.0]]] * 2
    seed = spark.createDataFrame(
        [(1, [0.1, 0.0, 0.0, 0.0]), (2, [10.0, 10.0, 10.0, 9.9])],
        "vec_id long, embedding array<float>",
    )
    _, arts0 = AX.build_ann_index(
        seed, table, tracker, centroids=cents, codebooks=books
    )

    orig = writer_mod.write_versioned
    racer_bucket = {"value": "0"}

    def racing_write(df, table_, version_):
        orig(df, table_, version_)
        # metadata-only racer (a RemovePartition needs no data directory)
        tracker.commit(
            table.name,
            TableUpdate(
                TableUpdateMetadata.new("racer", "concurrent"),
                (RemovePartition(
                    Partition.of(("bucket", racer_bucket["value"])),
                ),),
            ),
        )

    batch = spark.createDataFrame(
        [(3, [0.0, 0.2, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )  # lands in bucket 0
    # the synthetic racer writes no sidecar, so artifacts are passed
    # explicitly throughout (a real racing extend writes its own)
    monkeypatch.setattr(writer_mod, "write_versioned", racing_write)
    with pytest.raises(CommitConflictError):
        AX.extend_ann_index(batch, table, tracker, artifacts=arts0)

    # WITH an id map (the build default) the upsert's read set is
    # bounded — touched buckets + batch shards — so a racer on a
    # DISJOINT bucket (and no shard commit) auto-merges: an id
    # collision would necessarily have touched one of our shards
    racer_bucket["value"] = "1"
    AX.extend_ann_index(batch, table, tracker, artifacts=arts0)
    # ...an APPEND (genuinely new id) with the same disjoint racer
    # auto-merges too
    batch4 = spark.createDataFrame(
        [(4, [0.0, 0.0, 0.2, 0.0])], "vec_id long, embedding array<float>"
    )
    AX.extend_ann_index(
        batch4, table, tracker, artifacts=arts0, mode="append"
    )
    # overlapping racer again, but last-writer-wins opts out of detection
    racer_bucket["value"] = "0"
    AX.extend_ann_index(
        batch, table, tracker, artifacts=arts0,
        concurrency="last-writer-wins",
    )
    monkeypatch.setattr(writer_mod, "write_versioned", orig)

    with pytest.raises(ValueError, match="concurrency"):
        AX.extend_ann_index(
            batch, table, tracker, artifacts=arts0, concurrency="pessimistic"
        )
    # duplicate ids in one batch: replace semantics would be ambiguous
    dup = spark.createDataFrame(
        [(9, [0.1, 0.0, 0.0, 0.0]), (9, [0.0, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="duplicate"):
        AX.extend_ann_index(dup, table, tracker, artifacts=arts0)
    # a NULL id is named as such, not misdiagnosed as a duplicate
    nulled = spark.createDataFrame(
        [(None, [0.1, 0.0, 0.0, 0.0]), (9, [0.0, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="NULL vec_id"):
        AX.extend_ann_index(nulled, table, tracker, artifacts=arts0)


@pytest.mark.slow
def test_probe_of_empty_cluster_returns_empty_like_in_memory(spark, tmp_path):
    """A memberless k-means cluster has no partition; probing it must
    yield the in-memory contract (zero rows, same schema), not an error."""
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annz"), str(tmp_path / "annz"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    cents = [(0, [0.0] * 4), (1, [100.0] * 4)]  # bucket 1 stays memberless
    books = [[[0.0, 0.0], [10.0, 10.0]]] * 2
    corpus = spark.createDataFrame(
        [(1, [0.1, 0.0, 0.0, 0.0]), (2, [0.0, 0.2, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    AX.build_ann_index(corpus, table, tracker, centroids=cents, codebooks=books)
    q = spark.createDataFrame(
        [(7, [99.0, 100.0, 100.0, 100.0])], "query_id long, qv array<float>"
    )
    res = AX.ivfpq_topk_indexed(spark, table, tracker, q, k=3, n_probe=1)
    assert res.count() == 0
    mem = SIM.ivfpq_topk(
        corpus, q, k=3, n_probe=1, centroids=cents, codebooks=books
    )
    assert mem.count() == 0
    # schema matches the non-empty path (derived, not hardcoded)
    nonempty = AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=3, n_probe=2
    )
    assert res.schema == nonempty.schema
    # and a no-queries batch takes the same derived-schema path
    empty_q = q.limit(0)
    assert AX.ivfpq_topk_indexed(
        spark, table, tracker, empty_q, k=3, n_probe=1
    ).schema == nonempty.schema


@pytest.mark.slow
def test_vacuum_artifacts_protects_branch_committed_labels(spark, tmp_path):
    from datetime import timedelta

    from chronicles_spark import branching as B

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annb"), str(tmp_path / "annb"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    AX.build_ann_index(
        emb, table, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB, iters=1
    )
    B.create_branch(tracker, table.name, "stage", "t", location=table.location)
    bdef = B.branch_table_def(table, "stage")
    _, barts = AX.build_ann_index(
        emb, bdef, tracker, n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB, iters=2,
        message="branch rebuild",
    )
    # the branch-committed label must NOT be treated as an aged orphan
    doomed = AX.vacuum_ann_artifacts(
        table, tracker, dry_run=True, orphan_min_age=timedelta(seconds=-1)
    )
    assert all(barts.version_label not in p for p in doomed)
    with pytest.raises(ValueError, match="is a branch"):
        AX.vacuum_ann_artifacts(bdef, tracker)


@pytest.mark.slow
def test_ann_stream_sink_maintains_index(spark, tmp_path):
    """A real embedding stream (file source, several micro-batches) keeps
    the index current: after the drain, the indexed search equals the
    in-memory search over the full corpus under the same artifacts."""
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "anns"), str(tmp_path / "anns"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = SIM.kmeans_fit(emb, N_CLUSTERS, 1)
    books = SIM.pq_fit(emb, m=M, k_sub=K_SUB, iters=1)
    seed = emb.where(F.col("vec_id") < 10)
    _, arts = AX.build_ann_index(
        seed, table, tracker, centroids=cents, codebooks=books
    )

    src = str(tmp_path / "emb_src")
    emb.where(F.col("vec_id") >= 10).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
    )
    q = AX.ann_stream_sink(
        stream, table, tracker, "t", str(tmp_path / "ckpt"), artifacts=arts
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive
    if q.exception() is not None:
        raise q.exception()

    # >= 2 extend commits landed (one per non-empty micro-batch)
    msgs = [
        u.metadata.message
        for u in tracker.table_state(table.name).updates
        if u.metadata.message.startswith("ann-stream epoch ")
    ]
    assert len(msgs) >= 2

    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, table, tracker, queries, k=3, n_probe=2
    ).collect()))
    want = sorted(map(tuple, SIM.ivfpq_topk(
        emb, queries, k=3, n_probe=2, centroids=cents, codebooks=books
    ).collect()))
    assert got == want and got


@pytest.mark.slow
def test_ann_stream_epoch_replay_and_regression_guard(spark, tmp_path):
    from chronicles_spark.spark import read_current

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annr"), str(tmp_path / "annr"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    _, arts = AX.build_ann_index(
        emb.where(F.col("vec_id") < 10), table, tracker,
        n_clusters=N_CLUSTERS, m=M, k_sub=K_SUB, iters=1,
    )
    batch = emb.where((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    cache: dict = {}
    AX.commit_ann_stream_batch(
        batch, 0, table, tracker, artifacts=arts, epoch_cache=cache
    )
    n1 = read_current(spark, table, tracker).count()
    n_commits = len(list(tracker.table_state(table.name).updates))
    # replay of the same epoch: skipped entirely (no new commit)
    AX.commit_ann_stream_batch(
        batch, 0, table, tracker, artifacts=arts, epoch_cache=cache
    )
    assert len(list(tracker.table_state(table.name).updates)) == n_commits
    assert read_current(spark, table, tracker).count() == n1
    # replay detection also works from a COLD cache (log-derived)
    AX.commit_ann_stream_batch(
        batch, 0, table, tracker, artifacts=arts, epoch_cache={}
    )
    assert len(list(tracker.table_state(table.name).updates)) == n_commits
    # a regressed epoch id = wiped checkpoint under a reused prefix
    with pytest.raises(RuntimeError, match="behind the latest"):
        AX.commit_ann_stream_batch(
            batch, -1, table, tracker, artifacts=arts, epoch_cache={}
        )
    # next epoch appends
    batch2 = emb.where((F.col("vec_id") >= 20) & (F.col("vec_id") < 25))
    AX.commit_ann_stream_batch(
        batch2, 1, table, tracker, artifacts=arts, epoch_cache=cache
    )
    assert read_current(spark, table, tracker).count() == n1 + 5


def test_empty_query_on_initialized_empty_index_is_noop(spark, tmp_path):
    """Search wired up before the first build (artifacts explicit, no
    committed data, empty batch) must return zero rows, not raise."""
    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annq"), str(tmp_path / "annq"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    arts = AX.AnnArtifacts(
        centroids=((0, (0.0,) * 4), (1, (10.0,) * 4)),
        codebooks=(((0.0, 0.0), (10.0, 10.0)),) * 2,
        version_label="none",
    )
    empty_q = spark.createDataFrame(
        [], "query_id long, qv array<float>"
    )
    res = AX.ivfpq_topk_indexed(
        spark, table, tracker, empty_q, k=3, n_probe=1, artifacts=arts
    )
    assert res.count() == 0
    assert res.columns == ["query_id", "rank", "neighbor_id", "adc_dist"]


def test_index_over_cas_tracker_and_vacuum_after_extend(spark, tmp_path):
    """The ANN index composes with the object-store commit protocol and
    with GC: build+extend over a use_cas tracker (checkpoint cuts on),
    vacuum the superseded touched-bucket versions, and the indexed
    search still equals the in-memory one."""
    from chronicles_spark.spark import vacuum

    tracker = FileBackedVersionTracker(
        str(tmp_path / "_log"), use_cas=True, checkpoint_interval=2
    )
    table = TableDefinition(
        TableName("demo", "anncas"), str(tmp_path / "anncas"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = SIM.kmeans_fit(emb, N_CLUSTERS, 1)
    books = SIM.pq_fit(emb, m=M, k_sub=K_SUB, iters=1)
    AX.build_ann_index(
        emb.where(F.col("vec_id") < 25), table, tracker,
        centroids=cents, codebooks=books,
    )
    AX.extend_ann_index(emb.where(F.col("vec_id") >= 25), table, tracker)
    removed = vacuum(table, tracker, keep_last=1)
    # superseded versions of the extended buckets were reclaimed
    assert removed
    AX.vacuum_ann_artifacts(table, tracker)

    q = _queries(emb)
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=3, n_probe=2
    ).collect()))
    want = sorted(map(tuple, SIM.ivfpq_topk(
        emb, q, k=3, n_probe=2, centroids=cents, codebooks=books
    ).collect()))
    assert got == want and got
    # checkpointed CAS resolution agrees with a full-fold ground truth
    truth = FileBackedVersionTracker(
        str(tmp_path / "_log"), checkpoint_interval=None
    )
    assert tracker.current_version(table.name) == truth.current_version(
        table.name
    )


def test_extend_syncs_metastore_including_removals(spark, tmp_path):
    """extend's commit flows through the shared writer, so an attached
    metastore receives the partition ADDs and — for a bucket emptied by
    a moved upsert — the partition REMOVE."""
    from chronicles_spark.spark.metastore import InMemoryMetastore

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annm"), str(tmp_path / "annm"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    ms = InMemoryMetastore()
    ms.create_table(table)
    cents = [(0, [0.0] * 4), (1, [10.0] * 4)]
    books = [[[0.0, 0.0], [10.0, 10.0]]] * 2
    corpus = spark.createDataFrame(
        [(1, [0.1, 0.0, 0.0, 0.0]), (3, [10.0, 10.0, 10.0, 9.9])],
        "vec_id long, embedding array<float>",
    )
    AX.build_ann_index(
        corpus, table, tracker, centroids=cents, codebooks=books,
        metastore=ms,
    )
    synced = ms.current_version(table)
    assert {
        dict(p.column_values)["bucket"] for p in synced.partition_versions
    } == {"0", "1"}
    # move vector 3 near the origin: bucket 1 empties → metastore DROP
    moved = spark.createDataFrame(
        [(3, [0.0, 0.0, 0.3, 0.0])], "vec_id long, embedding array<float>"
    )
    state2, _ = AX.extend_ann_index(moved, table, tracker, metastore=ms)
    synced2 = ms.current_version(table)
    assert {
        dict(p.column_values)["bucket"] for p in synced2.partition_versions
    } == {"0"}
    assert synced2.partition_versions == state2.partition_versions
