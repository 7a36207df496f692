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
    with pytest.raises(ValueError, match="different versions"):
        AX.load_ann_artifacts(table, mixed)
    with pytest.raises(ValueError, match="no live index data"):
        AX.load_ann_artifacts(table, PartitionedTableVersion({}))
    # but explicit artifacts still search a mixed table (contract)
    q = _queries(emb)
    res = AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=2, n_probe=2, artifacts=artifacts
    )
    assert res.count() == 6
