"""Round-10: the incremental SEMANTIC dedup index
(operators/semantic_dedup_index.py) — the FOURTH family instance:
k-means clusters (pinned in the sidecar) as the candidate generator,
exact cosine as the verifier.

Differentials mirror the other families': build+extend == the one-shot
semantic_dedup under the SAME injected centroids (skew sub-buckets
disabled) restricted to batch-endpoint pairs; verify empty after every
step; a re-submitted vector that MOVES clusters replaces its band row;
re-shard rebuild keeps the pinned centroids.
"""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import (
    dedup as DD,
    semantic_dedup_index as SDX,
)
from chronicles_spark.operators.similarity import kmeans_fit
from chronicles_spark.sources import load_table
from chronicles_spark.trackers import FileBackedVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

DIM, K, THRESH = 64, 4, 0.4  # the sf0.001 fixture's densest cosine band


def _mk_index(tmp_path, name):
    tracker = FileBackedVersionTracker(str(tmp_path / f"_log_{name}"))
    table = TableDefinition(
        TableName("demo", name), str(tmp_path / name),
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    return table, tracker


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6)) for r in df.collect()
    )


def _one_shot(emb, centroids, where):
    return _pairs(
        DD.semantic_dedup(
            emb, dim=DIM, n_clusters=K, threshold=THRESH,
            centroids=centroids, max_cluster_size=10**9,
        ).where(where)
    )


def test_incremental_equals_one_shot_same_centroids(spark, tmp_path):
    """build(corpus) + extend(B1) + extend(B2) finds exactly the
    same-cluster pairs one semantic_dedup over corpus∪B1∪B2 finds under
    the identical pinned centroids — endpoints and exact cosines."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.where("vec_id < 300")
    b1 = emb.where("vec_id >= 300 AND vec_id < 400")
    b2 = emb.where("vec_id >= 400")
    cents = kmeans_fit(corpus, K, iters=2)

    table, tracker = _mk_index(tmp_path, "inc")
    _, arts = SDX.build_semantic_dedup_index(
        corpus, table, tracker, dim=DIM, n_clusters=K, centroids=cents,
        band_shards=8, doc_shards=4,
    )
    assert arts.centroid_list() == SDX.SemanticDedupArtifacts.from_json(
        arts.to_json()
    ).centroid_list()
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0

    p1, _, _ = SDX.extend_semantic_dedup_index(
        b1, table, tracker, threshold=THRESH
    )
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0
    p2, _, _ = SDX.extend_semantic_dedup_index(
        b2, table, tracker, threshold=THRESH
    )
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0

    base_pairs = _one_shot(corpus, cents, "1=1")
    got = sorted(base_pairs + _pairs(p1) + _pairs(p2))
    want = _one_shot(emb, cents, "1=1")
    assert got == want and want  # fixture has known near-dups

    assert _pairs(p1) == _one_shot(
        emb.where("vec_id < 400"), cents, "id_b >= 300"
    )


def test_resubmission_moves_cluster(spark, tmp_path):
    """Upsert semantics when the new vector lands in a DIFFERENT
    cluster: the old band row is removed (assignment re-derived from the
    stored vector), the index equals a from-scratch build over the
    updated corpus, and stale content never pairs."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.where("vec_id < 200")
    cents = kmeans_fit(corpus, K, iters=2)
    table, tracker = _mk_index(tmp_path, "resub")
    SDX.build_semantic_dedup_index(
        corpus, table, tracker, dim=DIM, n_clusters=K, centroids=cents,
        band_shards=8, doc_shards=4,
    )

    donor = corpus.where("vec_id = 11").collect()[0]["embedding"]
    batch = spark.createDataFrame(
        [(7, list(donor)), (900, list(donor))],
        "vec_id long, embedding array<float>",
    )
    pairs, _, _ = SDX.extend_semantic_dedup_index(
        batch, table, tracker, threshold=THRESH
    )
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0
    got = _pairs(pairs)
    assert (7, 11, 1.0) in got and (7, 900, 1.0) in got

    updated = corpus.where("vec_id <> 7").unionByName(batch)
    assert got == _one_shot(
        updated, cents, "id_a IN (7, 900) OR id_b IN (7, 900)"
    )

    table2, tracker2 = _mk_index(tmp_path, "resub2")
    SDX.build_semantic_dedup_index(
        updated, table2, tracker2, dim=DIM, n_clusters=K, centroids=cents,
        band_shards=8, doc_shards=4,
    )
    from chronicles_spark.spark.reader import read_version

    def contents(t, tr):
        st = tr.current_version(t.name)
        return sorted(
            map(tuple, read_version(spark, t, st, infer_partition_types=False)
                .select("vec_id", "band_id", "band_key").collect())
        )

    assert contents(table, tracker) == contents(table2, tracker2)


def test_rebuild_reshards_same_centroids(spark, tmp_path):
    """Re-shard rebuild keeps the pinned quantizer: extends after the
    migration agree with the one-shot, and the centroids are
    byte-identical across the rebuild."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.where("vec_id < 400")
    cents = kmeans_fit(corpus, K, iters=2)
    table, tracker = _mk_index(tmp_path, "regeo")
    _, arts0 = SDX.build_semantic_dedup_index(
        corpus, table, tracker, dim=DIM, n_clusters=K, centroids=cents,
        band_shards=4, doc_shards=2,
    )
    _, arts1 = SDX.rebuild_semantic_dedup_index(
        spark, table, tracker, band_shards=16, doc_shards=8
    )
    assert arts1.centroids == arts0.centroids
    assert (arts1.band_shards, arts1.doc_shards) == (16, 8)
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0

    pairs, _, _ = SDX.extend_semantic_dedup_index(
        emb.where("vec_id >= 400"), table, tracker, threshold=THRESH
    )
    assert _pairs(pairs) == _one_shot(emb, cents, "id_b >= 400 OR id_a >= 400")
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0


def test_centroid_geometry_pinned(spark, tmp_path):
    """Extending under DIFFERENT centroids is refused by the sidecar
    agreement check (artifacts injection bypass included), and a
    mismatched dim batch is rejected."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    corpus = emb.where("vec_id < 100")
    cents = kmeans_fit(corpus, K, iters=1)
    table, tracker = _mk_index(tmp_path, "pin")
    _, arts = SDX.build_semantic_dedup_index(
        corpus, table, tracker, dim=DIM, n_clusters=K, centroids=cents,
        band_shards=4, doc_shards=2,
    )
    bad = spark.createDataFrame(
        [(900, [0.1] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim"):
        SDX.extend_semantic_dedup_index(bad, table, tracker)
    with pytest.raises(ValueError, match="n_clusters"):
        SDX.build_semantic_dedup_index(
            corpus, table, tracker, dim=DIM, n_clusters=K + 1,
            centroids=cents, band_shards=4, doc_shards=2,
        )
