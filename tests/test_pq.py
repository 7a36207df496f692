"""Product quantization (operators/similarity.py pq_*) vs an independent
numpy reference implementing the identical algorithm — same deterministic
init (subvectors of the k_sub lowest-id vectors), same argmin-with-lowest-
code tie-break, same mean update, same ADC rounding — float tolerance only
for summation-order differences.
"""

import os

import numpy as np
import pytest

from chronicles_spark.operators import similarity as SIM
from chronicles_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

M, K_SUB, ITERS = 4, 4, 2


def _numpy_pq_fit(ids, vecs, m, k_sub, iters):
    d = vecs.shape[1]
    sub_d = d // m
    order = np.argsort(ids)
    books = []
    for s in range(m):
        sv = vecs[:, s * sub_d:(s + 1) * sub_d].astype(np.float64)
        cents = sv[order[:k_sub]].copy()
        for _ in range(iters):
            dist = ((sv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)  # argmin ties -> lowest code
            for c in range(k_sub):
                members = sv[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents)
    return books


def _numpy_pq_encode(vecs, books):
    m = len(books)
    sub_d = books[0].shape[1]
    codes = np.zeros((len(vecs), m), dtype=int)
    for s in range(m):
        sv = vecs[:, s * sub_d:(s + 1) * sub_d]
        dist = ((sv[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = dist.argmin(axis=1)
    return codes


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_DIR, "embeddings")
    rows = df.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, vecs


@pytest.fixture(scope="module")
def fitted(spark, emb):
    df, ids, vecs = emb
    books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=ITERS)
    ref = _numpy_pq_fit(ids, vecs, M, K_SUB, ITERS)
    return df, ids, vecs, books, ref


def test_pq_fit_matches_numpy(fitted):
    _, _, _, books, ref = fitted
    assert len(books) == M and all(len(cb) == K_SUB for cb in books)
    for s in range(M):
        np.testing.assert_allclose(np.array(books[s]), ref[s], atol=1e-9)


def test_pq_encode_matches_numpy(fitted):
    df, ids, vecs, books, ref = fitted
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in SIM.pq_encode(df, books).collect()
    }
    expected = _numpy_pq_encode(vecs, ref)
    assert got == {int(i): list(map(int, c)) for i, c in zip(ids, expected)}


def test_pq_decode_reconstructs_codebook_concat(fitted):
    df, ids, vecs, books, _ = fitted
    codes = SIM.pq_encode(df, books)
    dec = {r["vec_id"]: np.array(r["v_approx"]) for r in
           SIM.pq_decode(codes, books).collect()}
    codes_np = _numpy_pq_encode(vecs, [np.array(b) for b in books])
    sub_d = vecs.shape[1] // M
    # reconstruction = concat of selected centroids, and it must be a
    # strictly better approximation than the global mean (sanity on the
    # 32x-compression claim)
    gmean = vecs.mean(axis=0)
    err_pq, err_mean = 0.0, 0.0
    for i, vid in enumerate(ids):
        expected = np.concatenate(
            [np.array(books[s][codes_np[i, s]]) for s in range(M)]
        )
        np.testing.assert_allclose(dec[int(vid)], expected, atol=1e-9)
        err_pq += ((vecs[i] - expected) ** 2).sum()
        err_mean += ((vecs[i] - gmean) ** 2).sum()
    assert err_pq < err_mean
    assert len(dec[int(ids[0])]) == M * sub_d


def test_pq_adc_topk_matches_numpy(spark, fitted):
    df, ids, vecs, books, ref = fitted
    codes = SIM.pq_encode(df, books)
    q_ids = [0, 1, 2]
    queries = df.where(df.vec_id < 3).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    got = SIM.pq_adc_topk(codes, queries, books, k=5).collect()

    codes_np = _numpy_pq_encode(vecs, ref)
    sub_d = vecs.shape[1] // M
    expected = {}
    for qid in q_ids:
        qv = vecs[ids == qid][0]
        # the (sub, code) lookup table, then sum per corpus vector
        dtab = np.zeros((M, K_SUB))
        for s in range(M):
            qsub = qv[s * sub_d:(s + 1) * sub_d]
            dtab[s] = ((ref[s] - qsub[None, :]) ** 2).sum(axis=1)
        adc = np.array([
            round(sum(dtab[s, codes_np[i, s]] for s in range(M)), 6)
            for i in range(len(ids))
        ])
        order = sorted(zip(adc, ids.tolist()))  # ascending dist, id tiebreak
        expected[qid] = [(r + 1, vid, d) for r, (d, vid) in enumerate(order[:5])]

    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["adc_dist"])
        )
    for qid in q_ids:
        g = sorted(got_by_q[qid])
        e = expected[qid]
        assert [(a, b) for a, b, _ in g] == [(a, b) for a, b, _ in e]
        np.testing.assert_allclose(
            [d for _, _, d in g], [d for _, _, d in e], atol=1e-6
        )


def test_pq_fit_validation(spark, emb):
    df, _, _ = emb
    with pytest.raises(ValueError, match="not divisible"):
        SIM.pq_fit(df, m=7)
    with pytest.raises(ValueError, match="m >= 1"):
        SIM.pq_fit(df, m=0)
    with pytest.raises(ValueError, match="train_fraction"):
        SIM.pq_fit(df, m=4, train_fraction=2.0)


def test_pq_fit_train_fraction_matches_numpy_on_sample(spark, emb):
    import hashlib

    df, ids, vecs = emb
    frac = 0.5

    def u(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:7], 16) / float(16**7)

    mask = np.array([u(i) < frac for i in ids])
    books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=ITERS, train_fraction=frac)
    ref = _numpy_pq_fit(ids[mask], vecs[mask], M, K_SUB, ITERS)
    for s in range(M):
        np.testing.assert_allclose(np.array(books[s]), ref[s], atol=1e-9)


def test_pq_matrix_paths_match_literal_paths(spark, emb, monkeypatch):
    """Past the literal ceiling, pq_fit's assignment and pq_encode switch
    to the broadcast codebook-matrix shape — both must agree exactly with
    the literal-expression paths (same argmin, same tie-breaks)."""
    df, ids, vecs = emb
    lit_books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=ITERS)
    lit_codes = {r["vec_id"]: list(r["pq_codes"])
                 for r in SIM.pq_encode(df, lit_books).collect()}
    monkeypatch.setattr(SIM, "_ASSIGN_LITERAL_CEILING", 1)
    mat_books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=ITERS)
    for s in range(M):
        np.testing.assert_allclose(
            np.array(mat_books[s]), np.array(lit_books[s]), atol=1e-12
        )
    mat_codes = {r["vec_id"]: list(r["pq_codes"])
                 for r in SIM.pq_encode(df, lit_books).collect()}
    assert mat_codes == lit_codes
    # and the matrix encode stays shuffle-free (broadcast + map only)
    plan = SIM.pq_encode(df, lit_books)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_ivfpq_matches_numpy_reference(spark, emb):
    """Composed IVF+PQ search vs numpy: coarse k-means buckets (already
    differential-tested), probe selection by squared L2 with bucket-id
    tie-break, ADC only inside probed buckets.  No self-exclusion — the
    query relation's id space is independent of the corpus (same contract
    as pq_adc_topk), so a corpus-drawn query may rank its own quantized
    self first."""
    df, ids, vecs = emb
    n_clusters, n_probe, k = 4, 2, 5
    got = SIM.ivfpq_topk(
        df,
        df.where(df.vec_id < 3).select(
            df.vec_id.alias("query_id"), df.embedding.alias("qv")
        ),
        k=k, n_clusters=n_clusters, n_probe=n_probe,
        m=M, k_sub=K_SUB, iters=ITERS,
    ).collect()

    # numpy reference
    centroids = SIM.kmeans_fit(df, k=n_clusters, iters=ITERS)
    books = _numpy_pq_fit(ids, vecs, M, K_SUB, ITERS)
    cents = np.array([c for _, c in centroids])
    d2c = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    bucket = d2c.argmin(axis=1)
    codes = _numpy_pq_encode(vecs, books)
    sub_d = vecs.shape[1] // M

    expected = {}
    for qid in (0, 1, 2):
        qv = vecs[ids == qid][0]
        qd = ((cents - qv[None, :]) ** 2).sum(axis=1)
        probed = sorted(range(n_clusters), key=lambda b: (qd[b], b))[:n_probe]
        dtab = np.zeros((M, K_SUB))
        for s in range(M):
            qsub = qv[s * sub_d:(s + 1) * sub_d]
            dtab[s] = ((books[s] - qsub[None, :]) ** 2).sum(axis=1)
        cand = []
        for i, vid in enumerate(ids):
            if bucket[i] not in probed:
                continue
            adc = round(sum(dtab[s, codes[i, s]] for s in range(M)), 6)
            cand.append((adc, int(vid)))
        cand.sort()
        expected[qid] = [(r + 1, vid) for r, (_, vid) in enumerate(cand[:k])]

    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        assert sorted(got_by_q[qid]) == expected[qid], qid


def test_ivfpq_accepts_prefitted_artifacts(spark, emb):
    """Injected centroids/codebooks skip the internal fits — repeat query
    batches reuse one index and stay mutually comparable."""
    df, ids, vecs = emb
    cents = SIM.kmeans_fit(df, k=4, iters=1)
    books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=1)
    q = df.where(df.vec_id < 2).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    a = sorted(map(tuple, SIM.ivfpq_topk(
        df, q, k=3, n_probe=4, centroids=cents, codebooks=books
    ).collect()))
    b = sorted(map(tuple, SIM.ivfpq_topk(
        df, q, k=3, n_probe=4, centroids=cents, codebooks=books
    ).collect()))
    assert a == b and len(a) == 6  # same index → identical batches


def test_ivfpq_rejects_mismatched_injected_artifacts(spark, emb):
    df, _, _ = emb
    q = df.where(df.vec_id < 2).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    bad_cents = [(0, [0.0] * 32), (1, [1.0] * 32)]
    with pytest.raises(ValueError, match="injected centroids"):
        SIM.ivfpq_topk(df, q, centroids=bad_cents)
    bad_books = [[[0.0] * 8] * 2] * 4  # 4 subspaces x 8 dims = 32 != 64
    with pytest.raises(ValueError, match="injected codebooks"):
        SIM.ivfpq_topk(df, q, codebooks=bad_books)


def test_rerank_topk_matches_numpy(spark, fitted):
    """Exact re-rank over an ADC shortlist vs numpy recomputing the same
    metric over the same candidate pairs, both metrics, id tie-break."""
    df, ids, vecs, books, _ = fitted
    codes = SIM.pq_encode(df, books)
    q = df.where(df.vec_id < 3).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    short = SIM.pq_adc_topk(codes, q, books, k=10)
    pairs = [(r["query_id"], r["neighbor_id"]) for r in short.collect()]
    by_id = {int(i): vecs[n] for n, i in enumerate(ids)}

    for metric, col, sign in (("cosine", "cosine", -1), ("l2", "l2_dist", 1)):
        got = SIM.rerank_topk(short, df, q, k=4, metric=metric).collect()
        ref = {}
        for qid in (0, 1, 2):
            cands = [n for (qq, n) in pairs if qq == qid]
            scored = []
            for n in cands:
                a, b = by_id[qid], by_id[n]
                if metric == "cosine":
                    s = round(
                        float(a @ b)
                        / (float(np.sqrt(a @ a)) * float(np.sqrt(b @ b))),
                        6,
                    )
                else:
                    s = round(float(((a - b) ** 2).sum()), 6)
                scored.append((sign * s, n, s))
            scored.sort()
            ref[qid] = [(i + 1, n, s) for i, (_, n, s) in enumerate(scored[:4])]
        for r in got:
            rank_ref = ref[r["query_id"]][r["rank"] - 1]
            assert (r["neighbor_id"], ) == (rank_ref[1], )
            assert abs(r[col] - rank_ref[2]) < 1e-9
        assert len(got) == sum(len(v) for v in ref.values())
    with pytest.raises(ValueError, match="metric"):
        SIM.rerank_topk(short, df, q, metric="dot")


def test_artifact_validation_rejects_empty_and_warns_on_empty_corpus(
    spark, emb
):
    """Round-6 advice fix: empty injected artifact lists raise ValueError
    (previously IndexError), mutually-inconsistent artifacts raise even
    when the corpus is empty, and an empty corpus emits a warning instead
    of silently skipping validation."""
    import warnings

    df, _, _ = emb
    q = df.where(df.vec_id < 2).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    with pytest.raises(ValueError, match="centroids list is empty"):
        SIM.ivfpq_topk(df, q, centroids=[])
    with pytest.raises(ValueError, match="codebooks are empty"):
        SIM.ivfpq_topk(df, q, codebooks=[])
    with pytest.raises(ValueError, match="codebooks are empty"):
        SIM.ivfpq_topk(df, q, codebooks=[[], []])
    empty = df.limit(0)
    # inconsistent pair: caught by cross-validation even with no corpus
    with pytest.raises(ValueError, match="disagree with each other"):
        SIM.validate_ann_artifacts(
            empty, "embedding",
            [(0, [0.0] * 32)], [[[0.0] * 16] * 2] * 4,
        )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SIM.validate_ann_artifacts(
            empty, "embedding", [(0, [0.0] * 32)], None
        )
    assert any("cannot be validated" in str(x.message) for x in w)


def test_ivfpq_reordered_injected_centroids_bucket_correctly(spark, emb):
    """Round-6 advice fix: the literal assignment path must honour the
    STORED centroid ids (ivfpq_topk accepts caller lists where cid !=
    list position) — a reordered list must give identical search results
    to the sorted list."""
    df, _, _ = emb
    cents = SIM.kmeans_fit(df, k=4, iters=1)
    books = SIM.pq_fit(df, m=M, k_sub=K_SUB, iters=1)
    q = df.where(df.vec_id < 2).select(
        df.vec_id.alias("query_id"), df.embedding.alias("qv")
    )
    shuffled = [cents[2], cents[0], cents[3], cents[1]]
    a = sorted(map(tuple, SIM.ivfpq_topk(
        df, q, k=3, n_probe=2, centroids=cents, codebooks=books
    ).collect()))
    b = sorted(map(tuple, SIM.ivfpq_topk(
        df, q, k=3, n_probe=2, centroids=shuffled, codebooks=books
    ).collect()))
    assert a == b
    # and _assign_nearest itself maps to the real cids, both paths
    v = df.select("vec_id", SIM.as_double(df.embedding).alias("v"))
    lit_assign = {
        r["vec_id"]: r["cluster"]
        for r in SIM._assign_nearest(v, shuffled).collect()
    }
    sorted_assign = {
        r["vec_id"]: r["cluster"]
        for r in SIM._assign_nearest(v, cents).collect()
    }
    assert lit_assign == sorted_assign
