"""semantic_dedup (SemDeDup-style) vs an independent numpy reference:
k-means is already differential-tested (tests/test_kmeans_ivf.py), so the
reference recomputes cluster assignments with numpy and takes ALL
same-cluster pairs with cosine >= threshold — the Spark result must match
exactly when no cluster exceeds max_cluster_size, and must be a sound
subset (every returned pair true) when the sub-bucket skew guard kicks in.
"""

import os

import numpy as np
import pytest

from chronicles_spark.operators import dedup as DD, similarity as SIM
from chronicles_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

K, ITERS, THRESH, DIM = 6, 2, 0.35, 64


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, vecs


def _ref_pairs(ids, vecs, centroids, threshold):
    cents = np.array([c for _, c in centroids])
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    norms = np.linalg.norm(vecs, axis=1)
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and assign[i] == assign[j]:
                cos = round(vecs[i] @ vecs[j] / (norms[i] * norms[j]), 6)
                if cos >= threshold:
                    out.add((int(ids[i]), int(ids[j])))
    return out, assign


def test_semantic_dedup_matches_numpy_same_cluster_pairs(spark, emb):
    df, ids, vecs = emb
    centroids = SIM.kmeans_fit(df, k=K, iters=ITERS)
    expected, _ = _ref_pairs(ids, vecs, centroids, THRESH)
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.semantic_dedup(
            df, dim=DIM, n_clusters=K, iters=ITERS, threshold=THRESH,
            max_cluster_size=10**9,  # guard off: exact same-cluster pairs
        ).collect()
    }
    assert got == expected
    assert len(got) > 0  # the fixture must actually exercise the operator


def test_semantic_dedup_skew_guard_returns_sound_subset(spark, emb):
    df, ids, vecs = emb
    centroids = SIM.kmeans_fit(df, k=K, iters=ITERS)
    full, assign = _ref_pairs(ids, vecs, centroids, THRESH)
    got_rows = DD.semantic_dedup(
        df, dim=DIM, n_clusters=K, iters=ITERS, threshold=THRESH,
        max_cluster_size=5,  # force sub-bucketing everywhere
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    assert got <= full  # sound: never invents a pair
    # every returned cosine is genuinely above threshold
    norms = np.linalg.norm(vecs, axis=1)
    idx = {int(v): i for i, v in enumerate(ids)}
    for r in got_rows:
        i, j = idx[r["id_a"]], idx[r["id_b"]]
        cos = round(float(vecs[i] @ vecs[j] / (norms[i] * norms[j])), 6)
        assert cos >= THRESH
        np.testing.assert_allclose(r["cosine"], cos, atol=1e-6)


def test_semantic_dedup_pairs_compose_with_dedup_clusters(spark, emb):
    df, _, _ = emb
    pairs = DD.semantic_dedup(
        df, dim=DIM, n_clusters=K, iters=ITERS, threshold=THRESH,
        max_cluster_size=10**9,
    )
    clusters = DD.dedup_clusters(pairs, id_col="vec_id").collect()
    assert clusters  # edges resolve to survivor labels
    for r in clusters:
        assert r["cluster_id"] <= r["vec_id"]
        assert r["keep"] == (r["cluster_id"] == r["vec_id"])


def test_semantic_dedup_threshold_validation(spark, emb):
    df, _, _ = emb
    with pytest.raises(ValueError, match="cosine"):
        DD.semantic_dedup(df, dim=DIM, threshold=1.5)


def test_semantic_dedup_rejects_wrong_dim(spark, emb):
    df, _, _ = emb
    with pytest.raises(ValueError, match="does not match the embedding"):
        DD.semantic_dedup(df, dim=DIM + 1, n_clusters=4, iters=1)
