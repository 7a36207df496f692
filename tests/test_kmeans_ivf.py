"""Distributed k-means vs an independent numpy reference implementing the
identical algorithm (same deterministic init, same assignment rule, same
mean update) — float tolerance only for summation-order differences."""

import os

import numpy as np
import pytest

from chronicles_spark.operators import similarity as SIM
from chronicles_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _numpy_kmeans(ids, vecs, k, iters):
    order = np.argsort(ids)
    seeds = vecs[order[:k]]
    centroids = seeds.astype(np.float64).copy()
    for _ in range(iters):
        # squared-L2 to each centroid; argmin ties -> lowest centroid id
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        # clusters that lose all members keep their previous centroid —
        # mirror of the Spark impl, which only updates observed clusters
    return centroids, assign


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, vecs


def test_kmeans_matches_numpy_reference(spark, emb):
    df, ids, vecs = emb
    k, iters = 4, 3
    got = SIM.kmeans_fit(df, k=k, iters=iters)
    expected, _ = _numpy_kmeans(ids, vecs, k, iters)
    assert [cid for cid, _ in got] == list(range(k))
    np.testing.assert_allclose(
        np.array([c for _, c in got]), expected, atol=1e-9
    )


def test_assignment_matches_numpy(spark, emb):
    df, ids, vecs = emb
    k, iters = 4, 3
    centroids = SIM.kmeans_fit(df, k=k, iters=iters)
    from pyspark.sql import functions as F

    v = df.select("vec_id", SIM.as_double(F.col("embedding")).alias("v"))
    got = {
        r["vec_id"]: r["cluster"]
        for r in SIM._assign_nearest(v, centroids).collect()
    }
    ref_centroids, _ = _numpy_kmeans(ids, vecs, k, iters)
    d = ((vecs[:, None, :] - ref_centroids[None, :, :]) ** 2).sum(axis=2)
    expected = dict(zip(ids.tolist(), d.argmin(axis=1).tolist()))
    assert got == expected


@pytest.mark.slow
def test_ivf_kmeans_topk_shape_and_recall(spark, emb):
    df, ids, vecs = emb
    queries = df.selectExpr("vec_id").where("vec_id < 3")
    res = SIM.ivf_topk_kmeans(df, queries, k=5, n_probe=2, n_clusters=4, iters=2)
    rows = res.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid, lst in per_q.items():
        ranks = sorted(r for r, _ in lst)
        assert ranks == list(range(1, len(lst) + 1))
        assert qid not in {n for _, n in lst}
    # sanity recall: probed top-1 should be in the brute-force top-5 set
    brute = SIM.brute_topk(df, queries, k=5)
    brute_sets = {}
    for r in brute.collect():
        brute_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for qid, lst in per_q.items():
        top1 = min(lst)[1]
        assert top1 in brute_sets[qid]


def test_quantize_int8_roundtrip_error_bounded(spark, emb):
    df, ids, vecs = emb
    import numpy as np

    rows = SIM.quantize_int8(df).select("vec_id", "q_codes", "q_scale").collect()
    by_id = {r["vec_id"]: (np.array(r["q_codes"]), r["q_scale"]) for r in rows}
    for i, vid in enumerate(ids[:50]):
        q, scale = by_id[vid]
        assert np.abs(q).max() <= 127
        deq = q / scale
        # symmetric quantization error is bounded by half a code step
        assert np.abs(deq - vecs[i]).max() <= (0.5 / scale) + 1e-9


def test_normalize_l2_unit_norm(spark, emb):
    df, _, _ = emb
    import numpy as np

    rows = SIM.normalize_l2(df).select("embedding_unit").limit(20).collect()
    for r in rows:
        n = np.linalg.norm(np.array(r["embedding_unit"]))
        assert abs(n - 1.0) < 1e-4  # 6-decimal rounding slack


def test_kmeans_keeps_empty_cluster_centroids(spark):
    # two far groups, k=3: the seed centroids all start inside group A, so
    # at least one cluster loses all members once the far group pulls one
    # centroid away — its centroid must survive, not be dropped/renumbered
    import numpy as np

    data = [(i, [0.0, 0.0]) for i in range(5)] + [(10 + i, [100.0, 100.0]) for i in range(5)]
    df = spark.createDataFrame(
        [(i, v) for i, v in data], ["vec_id", "embedding"]
    )
    got = SIM.kmeans_fit(df, k=3, iters=4)
    assert [cid for cid, _ in got] == [0, 1, 2]  # ids stable, none dropped
    ids = np.array([i for i, _ in data])
    vecs = np.array([v for _, v in data], dtype=np.float64)
    expected, _ = _numpy_kmeans(ids, vecs, 3, 4)
    np.testing.assert_allclose(np.array([c for _, c in got]), expected, atol=1e-9)


def test_zero_vector_guards(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, 0.0, 4.0])], ["vec_id", "embedding"]
    )
    norm_rows = {r["vec_id"]: r["embedding_unit"]
                 for r in SIM.normalize_l2(df).collect()}
    assert norm_rows[1] is None                      # zero vector -> NULL unit
    assert norm_rows[2] == [0.6, 0.0, 0.8]

    q_rows = {r["vec_id"]: (r["q_codes"], r["q_scale"])
              for r in SIM.quantize_int8(df).collect()}
    assert q_rows[1] == ([0, 0, 0], 0.0)             # zero codes, scale 0
    codes, scale = q_rows[2]
    assert max(abs(c) for c in codes) == 127 and scale > 0


def test_brute_topk_shuffle_variant_matches_broadcast(spark, emb):
    df, ids, _ = emb
    qids = spark.createDataFrame([(int(i),) for i in ids[:5]], ["vec_id"])
    a = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in SIM.brute_topk(df, qids, k=5).collect()}
    b = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in SIM.brute_topk(df, qids, k=5, broadcast_queries=False).collect()}
    assert a == b and len(a) == 25


@pytest.mark.slow
def test_ivf_topk_large_query_set_not_broadcast(spark, emb):
    """1k-query workload: with broadcast_queries=False the stage-2 join must
    be a shuffle join — the query/probe side never appears under a
    BroadcastExchange (only the tiny centroid table is broadcast)."""
    df, ids, _ = emb
    big_q = spark.createDataFrame([(int(i),) for i in ids[:1000]], ["vec_id"])

    plan_bcast = SIM.ivf_topk(df, big_q, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    # default path: probes broadcast (2 BroadcastExchange: centroids+probes)
    assert plan_bcast.count("BroadcastExchange") >= 2

    # disable AUTO broadcast to emulate at-scale statistics (a corpus-sized
    # query frame would never pass the threshold); the explicit centroid
    # hint still applies
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_shuffle = SIM.ivf_topk(df, big_q, k=3, broadcast_queries=False) \
            ._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # corpus-scale path: only the centroid broadcast remains; the bucket
    # equi-join is a shuffle join (SortMergeJoin or ShuffledHashJoin)
    assert plan_shuffle.count("BroadcastExchange") == 1, plan_shuffle
    assert ("SortMergeJoin" in plan_shuffle) or ("ShuffledHashJoin" in plan_shuffle)

    # and results are identical on a small query set
    small_q = spark.createDataFrame([(int(i),) for i in ids[:5]], ["vec_id"])
    a = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in SIM.ivf_topk(df, small_q, k=3).collect()}
    b = {(r["query_id"], r["rank"]): r["neighbor_id"]
         for r in SIM.ivf_topk(df, small_q, k=3, broadcast_queries=False).collect()}
    assert a == b


@pytest.mark.slow
def test_kmeans_train_fraction_matches_numpy_on_same_sample(spark, emb):
    """train_fraction fits centroids on the deterministic md5-uniform
    sample — differential: numpy k-means over the SAME sample (recomputed
    independently from the hash rule) must agree exactly."""
    import hashlib

    df, ids, vecs = emb
    k, iters, frac = 4, 3, 0.5

    def u(vid) -> float:
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:7], 16) / float(16**7)

    mask = np.array([u(i) < frac for i in ids])
    assert k <= mask.sum() < len(ids)  # a real, non-trivial subset
    got = SIM.kmeans_fit(df, k=k, iters=iters, train_fraction=frac)
    expected, _ = _numpy_kmeans(ids[mask], vecs[mask], k, iters)
    np.testing.assert_allclose(np.array([c for _, c in got]), expected, atol=1e-9)


def test_kmeans_train_fraction_validation(spark, emb):
    df, _, _ = emb
    with pytest.raises(ValueError, match="train_fraction"):
        SIM.kmeans_fit(df, k=4, train_fraction=0.0)
    with pytest.raises(ValueError, match="training vectors"):
        SIM.kmeans_fit(df, k=4, iters=1, train_fraction=1e-9)


@pytest.mark.slow
def test_ivf_kmeans_with_train_fraction_still_searches_full_corpus(spark, emb):
    """Sampled training only affects centroid QUALITY: the bucket
    assignment and search still cover every corpus vector, so results
    remain a valid top-k over the full corpus."""
    df, ids, vecs = emb
    queries = df.selectExpr("vec_id").where("vec_id < 3")
    res = SIM.ivf_topk_kmeans(
        df, queries, k=5, n_probe=4, n_clusters=4, iters=2, train_fraction=0.5
    ).collect()
    assert {r["query_id"] for r in res} == {0, 1, 2}
    all_ids = set(ids.tolist())
    for r in res:
        assert r["neighbor_id"] in all_ids and r["neighbor_id"] != r["query_id"]


def test_assign_nearest_broadcast_matrix_path_matches_literal_path(
    spark, emb, monkeypatch
):
    """Past the literal ceiling the assignment switches to a broadcast
    centroid-matrix crossJoin + higher-order argmin — the two paths must
    agree exactly, tie-breaks included."""
    from pyspark.sql import functions as F

    df, ids, vecs = emb
    centroids = SIM.kmeans_fit(df, k=4, iters=2)
    v = df.select("vec_id", SIM.as_double(F.col("embedding")).alias("v"))
    lit_path = {r["vec_id"]: r["cluster"]
                for r in SIM._assign_nearest(v, centroids).collect()}
    monkeypatch.setattr(SIM, "_ASSIGN_LITERAL_CEILING", 1)
    mat_path = {r["vec_id"]: r["cluster"]
                for r in SIM._assign_nearest(v, centroids).collect()}
    assert mat_path == lit_path
    # and the matrix path is shuffle-free (pure map-side + broadcast)
    plan = SIM._assign_nearest(v, centroids)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_pq_adc_distributed_dtab_matches_broadcast(spark, emb):
    df, ids, vecs = emb
    books = SIM.pq_fit(df, m=4, k_sub=4, iters=1)
    codes = SIM.pq_encode(df, books)
    queries = df.where(df.vec_id < 3).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    a = sorted(
        map(tuple, SIM.pq_adc_topk(codes, queries, books, k=5).collect())
    )
    b = sorted(
        map(tuple, SIM.pq_adc_topk(
            codes, queries, books, k=5, broadcast_queries=False
        ).collect())
    )
    assert a == b


def test_kmeans_small_corpus_fits_fewer_centroids(spark):
    """Pre-round-5 contract: a corpus smaller than k (no sampling) fits
    one centroid per vector instead of raising; only an undersized
    SAMPLE raises."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(0.0)).alias("embedding"),
    )
    got = SIM.kmeans_fit(df, k=8, iters=1)
    assert len(got) == 3  # one per vector
    import pytest as _pytest

    with _pytest.raises(ValueError, match="training vectors"):
        SIM.kmeans_fit(df, k=8, iters=1, train_fraction=0.4)
