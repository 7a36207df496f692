"""Similarity search over embedding columns (array<float>).

* ``brute_topk`` — exact cosine top-k: broadcast the (small) query set,
  one pass over the corpus, per-query heap via window row_number. The
  shuffle carries only (query, candidate, score) survivors.
* ``ivf_topk`` — IVF-style two-stage search: assign every vector to its
  nearest centroid (tiny broadcast), probe only the ``n_probe`` closest
  centroid buckets per query. At 100 TB the corpus side is read once,
  bucketed by centroid id (partition pruning on a bucketed/partitioned
  layout makes probes near-free); this module uses deterministic
  representative centroids (min-id member per label) so the DuckDB oracle
  reproduces results exactly — swap in k-means centroids in production.
* ``sign_lsh_buckets`` — random-hyperplane sign buckets (deterministic,
  md5-derived ±1 hyperplanes) for candidate generation at scale.

All arithmetic: element-wise float32→float64, sequential folds, scores
rounded to 6 decimals before ranking with id tie-breaks — deterministic
and engine-reproducible.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window as W, functions as F


class _NonFiniteLiteral(Exception):
    """A vector literal holds NaN/Inf — SQL text can't render it."""


def _render_double_array_sql(x) -> str:
    """Nested float list → one SQL ``array(...)`` literal string.

    ``repr(float)`` is the shortest exact round-trip and Spark's parser
    reads ``...D`` suffixed literals with ``Double.parseDouble`` (correct
    rounding), so the parsed Literal is bit-equal to the Python doubles
    — pinned by tests/test_kmeans_ivf.py's path-equality checks."""
    if isinstance(x, (list, tuple)):
        return "array(" + ",".join(_render_double_array_sql(e) for e in x) + ")"
    v = float(x)
    if not math.isfinite(v):
        raise _NonFiniteLiteral()
    return repr(v) + "D"


def _lit_array(x) -> Column:
    """ONE Column for a (nested) float-vector literal, built from a single
    SQL-text parse instead of per-element ``F.lit`` calls.

    Why: plan CONSTRUCTION, not execution, dominated every centroid/
    codebook/hyperplane consumer at bench scale (round-15 profile —
    8-14 s per pq_fit iteration, a 19 s gap before the first job of a
    4-vector LSH extend).  ``F.lit(list)`` recurses into
    ``array(*[lit(x) ...])``: one py4j round-trip and one AST node per
    element; ndarray literals transfer element-wise too (~0.28 ms/elem).
    ``F.expr`` ships one string and parses ~1000 doubles in ~10 ms into
    a single Literal node, so both the py4j chatter and the analyzer
    tree collapse.  Bit-equality with the unrolled form is pinned in
    tests (repr round-trip + Double.parseDouble).  Non-finite values
    (NaN/Inf — never produced by the fits, but accepted by the old
    form) fall back to the unrolled per-element build."""
    try:
        return F.expr(_render_double_array_sql(x))
    except _NonFiniteLiteral:
        if isinstance(x, (list, tuple)) and x and isinstance(x[0], (list, tuple)):
            return F.array(*[_lit_array(e) for e in x])
        return F.array(*[F.lit(float(e)) for e in x])


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return F.round(dot(a, b) / (norm(a) * norm(b)), 6)


def brute_topk(
    df: DataFrame,
    query_ids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query id.

    query_ids: DataFrame with a single ``vec_id`` column. With the default
    ``broadcast_queries=True`` the (small) query set is broadcast and the
    corpus is scanned once — right for interactive query workloads.  Set
    ``broadcast_queries=False`` when the query set is itself large (won't
    fit a broadcast): the product is then computed as a partitioned
    cartesian — still O(N·Q) work (inherent to brute force; for
    corpus×corpus similarity use ``ivf_topk(..., broadcast_queries=False)``
    or ``dedup.embedding_lsh_dedup``), but no single node ever needs to
    hold the query set."""
    # per-vector norms ride the (small) per-row state instead of being
    # re-folded once per (query, neighbor) pair: round(dot/(nq*nv), 6)
    # is bit-equal to the inline cosine (same fold over the same array)
    # while the O(N·Q) product pays 1 fold per pair instead of 3
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")).select(
        F.col(id_col), "v", norm(F.col("v")).alias("nv")
    )
    q = (
        v.join(query_ids, id_col, "left_semi")
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
    )
    if broadcast_queries:
        joined = v.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    else:
        joined = v.crossJoin(q).where(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def representative_centroids(
    df: DataFrame, label_col: str = "label", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic per-label centroid: the embedding of the min-id member
    (medoid seed). Production path: k-means via pyspark.ml; this keeps the
    oracle bit-exact."""
    w = W.partitionBy(label_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col(label_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
    )


def ivf_topk(
    df: DataFrame,
    query_ids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF search: probe the n_probe nearest centroid buckets per query,
    exact cosine within the probed buckets only.

    ``broadcast_queries=False`` is the corpus-scale path: only the CENTROID
    table (k·dim — always tiny) is broadcast in stage 1, and stage 2
    becomes a shuffle equi-join on the bucket key, so a query set as large
    as the corpus itself is co-partitioned with its probed buckets instead
    of being replicated to every executor."""
    cents = representative_centroids(df, label_col, id_col, vec_col)
    # norms once per vector/query, not once per scored pair (bit-equal
    # cosine — the brute_topk note); centroid cosines stay inline (Q·k
    # rows, never bucket-squared)
    v = df.select(
        F.col(id_col), F.col(label_col).alias("bucket"), as_double(F.col(vec_col)).alias("v")
    ).select(F.col(id_col), "bucket", "v", norm(F.col("v")).alias("nv"))
    q = (
        v.join(query_ids, id_col, "left_semi")
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
    )
    # stage 1: nearest centroids (centroid side broadcast — always tiny)
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "centroid_id", cosine(F.col("qv"), F.col("cv")).alias("ccos")
    )
    wq = W.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qv", "nq", F.col("centroid_id").alias("probe_bucket"))
    )
    # stage 2: exact search inside probed buckets (bucket-equi join prunes;
    # without the broadcast hint Catalyst shuffles both sides on the bucket)
    probe_side = F.broadcast(probes) if broadcast_queries else probes
    joined = v.join(
        probe_side,
        (F.col("bucket") == F.col("probe_bucket")) & (F.col(id_col) != F.col("query_id")),
    )
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd k-means over the embedding column.

    The production centroid builder for :func:`ivf_topk_kmeans`
    (``representative_centroids`` stays as the oracle-exact variant).
    Deterministic: init = the k lowest-id vectors; assignment = min
    squared-L2 with lowest-centroid-id tie-break.

    Scale shape: per iteration ONE job — assignment is a map-side
    expression against broadcast centroid literals (k·dim doubles), the
    mean update is a (cluster, dim_pos) partial-aggregated shuffle of
    k·dim cells, and only the k·dim centroid matrix ever reaches the
    driver (same metadata-scale driver state as the reference's W1
    partition collect).

    ``train_fraction`` is the 100 TB knob: centroid QUALITY needs only a
    sample (the standard IVF practice — FAISS trains on ~39·k to 256·k
    vectors, not the corpus), so pass e.g. ``10_000_000 / corpus_rows``
    to fit on a deterministic md5-uniform sample.  The SAMPLED training
    set is persisted on executors across iterations (and unpersisted
    after), so the full corpus is scanned ONCE for sampling instead of
    once per iteration.  Without ``train_fraction`` nothing is persisted
    — caching a corpus-scale relation would spill the whole corpus to
    executor disk, so the default keeps the bounded-memory
    scan-per-iteration shape."""
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    if train_fraction is not None:
        v = _sample_uniform(v, id_col, train_fraction).persist()
    try:
        seed_rows = v.orderBy(F.col(id_col).asc()).limit(k).collect()
        if not seed_rows or (train_fraction is not None and len(seed_rows) < k):
            # an undersized SAMPLE is a caller error (raise the fraction);
            # an undersized corpus without sampling keeps the pre-round-5
            # contract and simply fits fewer centroids
            raise ValueError(
                f"k-means needs >= {k} training vectors, got {len(seed_rows)}"
                + (" — raise train_fraction" if train_fraction else "")
            )
        centroids = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]

        for _ in range(iters):
            centroids = _lloyd_step(v, centroids)
    finally:
        if train_fraction is not None:
            v.unpersist()
    return centroids


def _sample_uniform(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic md5-uniform row sample — the same cross-engine-stable
    draw as :func:`..text.with_uniform_hash` (reused, not re-derived, so
    the hash rule lives in one place).  Map-side filter, no shuffle."""
    if not (0.0 < fraction <= 1.0):
        raise ValueError("train_fraction must be in (0, 1]")
    from .text import with_uniform_hash

    return (
        with_uniform_hash(df, id_col)
        .where(F.col("u") < F.lit(fraction))
        .drop("u")
    )


def _lloyd_step(
    v: DataFrame, centroids: list[tuple[int, list[float]]]
) -> list[tuple[int, list[float]]]:
    """One Lloyd iteration: assign to broadcast centroid literals, mean
    per (cluster, dim_pos), collect the k·dim matrix.

    The mean update aggregates per-dim COLUMNS (avg(v[pos]) × dim,
    grouped by cluster) instead of posexploding every vector into dim
    rows: the same Average aggregate sees the same values in the same
    per-partition order, but the dim× row blow-up and the (cluster, pos)
    shuffle key disappear — k rows × dim partial-agg cells cross the
    exchange either way, the explode's per-row work does not.  Past
    ``_PER_DIM_AGG_CEILING`` dims the aggregate-column list itself would
    bloat analysis/codegen, so the explode shape stays as the wide-dim
    fallback."""
    assigned = _assign_nearest(v, centroids)
    dim = len(centroids[0][1]) if centroids else 0
    if 0 < dim <= _PER_DIM_AGG_CEILING:
        rows = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.avg(F.element_at("v", p + 1)).alias(f"m{p}")
                    for p in range(dim)
                ]
            )
            .collect()
        )
        found = {r["cluster"]: [r[f"m{p}"] for p in range(dim)] for r in rows}
        # a cluster that lost every member keeps its previous centroid
        # (standard Lloyd behavior; dropping it would renumber buckets)
        return [(cid, found.get(cid, prev)) for cid, prev in centroids]
    cell = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = {}
    for r in cell:
        by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
    return [
        (
            cid,
            [by_cluster[cid][p] for p in sorted(by_cluster[cid])]
            if cid in by_cluster
            else prev,
        )
        for cid, prev in centroids
    ]


# above this many literal doubles in one assignment expression, switch
# from inlined centroid literals to a broadcast-joined centroid relation:
# huge literal trees slow analysis and fall out of codegen, while k·dim
# centroid ROWS broadcast fine at any k an IVF index realistically uses
_ASSIGN_LITERAL_CEILING = 16_384

# above this many vector dims, the Lloyd mean update falls back from
# per-dim aggregate columns (one avg(v[pos]) per dim) to the posexplode
# shape: thousands of aggregate expressions in one job slow analysis and
# overflow codegen method limits, while the explode handles any dim
_PER_DIM_AGG_CEILING = 2_048


def _assign_nearest(
    v: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(id, v) → + cluster: argmin squared-L2 against the centroids, ties
    to the lowest centroid id (centroid ids are list positions, so the
    shared ``_argmin_code`` position-argmin IS the id-argmin).

    Two physically different, semantically identical paths: small k·dim
    inlines the centroids as literals (one map-side expression, zero
    joins); past ``_ASSIGN_LITERAL_CEILING`` doubles the whole centroid
    MATRIX rides a single broadcast row (crossJoin with a 1-row relation
    — no literal tree, no shuffle) and the argmin is a higher-order
    ``array_min(transform(...))`` over it, still pure map-side — the
    shape that works at the k=65536 coarse quantizers a 100 TB IVF uses
    (equality of the two paths is pinned in tests/test_kmeans_ivf.py)."""
    k = len(centroids)
    dim = len(centroids[0][1]) if k else 0
    if k * dim <= _ASSIGN_LITERAL_CEILING:
        # _argmin_code argmins by list POSITION; the matrix path below uses
        # the stored cid.  kmeans_fit always produces cid == position, but
        # ivfpq_topk accepts caller-injected centroid lists, where a
        # reordered/filtered list would silently mis-bucket (and disagree
        # with probe selection, which uses real cids) — so translate the
        # position argmin through the cid list whenever they differ.
        pos = _argmin_code(F.col("v"), [c for _, c in centroids])
        cids = [cid for cid, _ in centroids]
        if cids != list(range(k)):
            # one parsed array literal (see _lit_array); the cast pins
            # the element type the unrolled int literals used to carry
            pos = F.element_at(
                F.expr("array(" + ",".join(str(int(c)) for c in cids) + ")")
                .cast("array<int>"),
                pos + 1,
            )
        return v.withColumn("cluster", pos)
    spark = v.sparkSession
    matrix = spark.createDataFrame(
        [([ (cid, list(c)) for cid, c in centroids ],)],
        "cents array<struct<cid int, cv array<double>>>",
    )
    # min(struct) orders by (d, cid): lowest distance, then lowest id —
    # the exact literal-path tie-break
    return (
        v.crossJoin(F.broadcast(matrix))
        .withColumn(
            "cluster",
            F.array_min(
                F.transform(
                    "cents",
                    lambda c: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("v"), c["cv"], lambda x, y: (x - y) * (x - y)
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        c["cid"].alias("cid"),
                    ),
                )
            )["cid"],
        )
        .drop("cents")
    )


def ivf_topk_kmeans(
    df: DataFrame,
    query_ids: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    n_clusters: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    train_fraction: float | None = None,
) -> DataFrame:
    """IVF search over LEARNED k-means buckets (vs ``ivf_topk``'s
    label-derived buckets): fit centroids, assign every vector once, then
    the same probe-and-verify two-stage search.  At 100 TB the assignment
    is written as a bucket/partition column so probes prune at the scan,
    and ``train_fraction`` fits the centroids on a deterministic sample
    instead of the full corpus (see :func:`kmeans_fit`).
    ``broadcast_queries=False`` = corpus-scale query sets (see
    :func:`ivf_topk`)."""
    centroids = kmeans_fit(
        df, n_clusters, iters, id_col, vec_col, train_fraction=train_fraction
    )
    v = _assign_nearest(
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v")), centroids
    ).select(
        id_col, F.col("cluster").alias("bucket"), "v",
        norm(F.col("v")).alias("nv"),
    )
    cents = df.sparkSession.createDataFrame(
        [(cid, c) for cid, c in centroids], ["centroid_id", "cv"]
    )
    q = (
        v.join(query_ids, id_col, "left_semi")
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nv").alias("nq"),
        )
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "centroid_id", cosine(F.col("qv"), F.col("cv")).alias("ccos")
    )
    wq = W.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= n_probe)
        .select("query_id", "qv", "nq", F.col("centroid_id").alias("probe_bucket"))
    )
    probe_side = F.broadcast(probes) if broadcast_queries else probes
    joined = v.join(
        probe_side,
        (F.col("bucket") == F.col("probe_bucket")) & (F.col(id_col) != F.col("query_id")),
    )
    # norms once per vector/query (bit-equal cosine — the brute_topk note)
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 bits (shared with any oracle:
    hashlib.md5 == SQL md5). Plane j, dim i sign = parity of first hex
    nibble of md5('<j>-<i>')."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}-{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) >= 8 else -1.0)
        planes.append(row)
    return planes


def sign_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket key per vector: bit j = sign(v · h_j).
    Map-side only; the bucket key then drives a groupBy/join for candidate
    pairs (cosine-similar vectors collide with high probability).

    ``dim`` is passed explicitly — probing the data for it would be a
    hidden driver-side Spark action at plan-construction time.  The
    composed candidate→verify dedup pipeline is
    :func:`chronicles_spark.operators.dedup.embedding_lsh_dedup`."""
    planes = hyperplane_signs(n_planes, dim)
    v = as_double(F.col(vec_col))
    bits = []
    for row in planes:
        # ONE parsed array-literal per plane (see _lit_array): unrolled
        # per-float literals made plan CONSTRUCTION dominate LSH callers
        # at toy scale; zip_with sees identical doubles (bit-equal)
        plane = _lit_array(row)
        bits.append(F.when(dot(v, plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket_key"))


def normalize_l2(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize the embedding column (unit vectors, 6-decimal rounding
    for engine-reproducible values); cosine then reduces to a dot product.
    Map-side only.  A zero vector has no direction — its ``embedding_unit``
    is NULL (explicit, instead of a divide-by-zero NaN array).

    The cast vector and its norm are STAGED as real columns before the
    per-element lambda references them: an expression captured inside a
    higher-order-function lambda is re-evaluated once per ELEMENT (HOFs
    sit outside codegen subexpression elimination), so the inline norm
    was an O(dim) fold re-run dim times per row — O(dim²).  Staged
    columns bind as O(1) attribute reads; round(x / n, 6) over identical
    values is bit-equal."""
    n = F.col("_l2_n")
    return (
        df.withColumn("_l2_v", as_double(F.col(vec_col)))
        .withColumn("_l2_n", norm(F.col("_l2_v")))
        .withColumn(
            "embedding_unit",
            F.when(n == 0.0, F.lit(None)).otherwise(
                F.transform(F.col("_l2_v"), lambda x: F.round(x / n, 6))
            ),
        )
        .drop("_l2_v", "_l2_n")
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization for embedding storage: per-vector scale
    127/max|x|, values floor(x*scale + 0.5) — explicit floor arithmetic
    (not round()) so every engine reproduces identical codes.  Cuts
    embedding storage 4x; dequantize with q/scale.  Map-side only.
    An all-zero vector gets scale 0 and all-zero codes (instead of an
    infinite scale overflowing the codes); dequantizers must treat
    ``q_scale = 0`` as the zero vector.

    The cast vector and the scale (an O(dim) max-abs fold) are staged as
    real columns — the normalize_l2 note: captured inside the quantize
    lambda, the inline scale was re-folded per element, O(dim²) per row."""
    scale = F.col("_q8_scale")
    staged = (
        df.withColumn("_q8_v", as_double(F.col(vec_col)))
        .withColumn(
            "_q8_amax",
            F.aggregate(
                F.transform(F.col("_q8_v"), lambda x: F.abs(x)), F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ),
        )
        .withColumn(
            "_q8_scale",
            F.when(F.col("_q8_amax") == 0.0, F.lit(0.0)).otherwise(
                F.lit(127.0) / F.col("_q8_amax")
            ),
        )
    )
    return staged.select(
        *df.columns,
        F.transform(
            F.col("_q8_v"), lambda x: F.floor(x * scale + F.lit(0.5)).cast("int")
        ).alias("q_codes"),
        F.round(scale, 6).alias("q_scale"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the standard 100 TB embedding-compression path
# (Jégou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
# 2011; the FAISS `IVFPQ` storage format).  Split the D-dim vector into m
# subspaces, k-means each subspace to k_sub centroids, store one byte-ish
# code per subspace: D floats → m small ints (e.g. 64×4B → 8×1B = 32×).
# Search uses Asymmetric Distance Computation: the query stays exact; per
# (sub, code) distances come from a tiny lookup table.


def pq_fit(
    df: DataFrame,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Learn PQ codebooks: ``m`` subspaces × ``k_sub`` centroids each.

    Returns ``codebooks[sub][code] -> centroid subvector`` (a
    metadata-scale m·k_sub·(D/m) = k_sub·D float matrix, same driver
    footprint class as the W1 partition collect).

    Scale shape: ONE job per Lloyd iteration for ALL subspaces — rows are
    exploded once to (id, sub, subvec) and every subspace's assignment +
    mean update rides the same shuffle, so the cost is independent of
    ``m``.  ``train_fraction`` samples the training set exactly like
    :func:`kmeans_fit` (the full corpus is only scanned by the caller's
    single :func:`pq_encode` pass).  Deterministic: init = subvectors of
    the ``k_sub`` lowest-id training vectors; ties to the lowest code."""
    if m < 1 or k_sub < 2:
        raise ValueError("need m >= 1 subspaces and k_sub >= 2 centroids")
    v = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    if train_fraction is not None:
        v = _sample_uniform(v, id_col, train_fraction)

    dim_row = v.select(F.size("v").alias("d")).limit(1).collect()
    if not dim_row:
        raise ValueError("no training vectors (raise train_fraction?)")
    dim = dim_row[0]["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    sub_d = dim // m

    # one exploded training relation: (id, sub, sv), persisted across iters
    subs = F.array(*[
        F.struct(
            F.lit(s).alias("sub"),
            F.slice("v", s * sub_d + 1, sub_d).alias("sv"),
        )
        for s in range(m)
    ])
    # persist only a SAMPLED training set; the exploded full corpus is m×
    # the input and would spill corpus-scale bytes to executor disk
    t = v.select(id_col, F.inline(subs))
    if train_fraction is not None:
        t = t.persist()
    try:
        seed_rows = (
            t.orderBy(F.col(id_col).asc(), F.col("sub").asc())
            .limit(m * k_sub)
            .collect()
        )
        by_sub: dict[int, list[list[float]]] = {s: [] for s in range(m)}
        for r in seed_rows:
            if len(by_sub[r["sub"]]) < k_sub:
                by_sub[r["sub"]].append(list(r["sv"]))
        if any(len(c) < k_sub for c in by_sub.values()):
            raise ValueError(
                f"PQ needs >= {k_sub} training vectors, got fewer"
                + (" — raise train_fraction" if train_fraction else "")
            )
        codebooks = [by_sub[s] for s in range(m)]

        use_matrix = k_sub * dim > _ASSIGN_LITERAL_CEILING
        for _ in range(iters):
            if use_matrix:
                assigned = (
                    t.crossJoin(
                        F.broadcast(_codebook_matrix_df(df.sparkSession, codebooks))
                    )
                    .withColumn(
                        "code",
                        _argmin_code_from_matrix(
                            F.col("sv"),
                            F.element_at("cbs", F.col("sub") + F.lit(1)),
                        ),
                    )
                    .drop("cbs")
                )
            else:
                assigned = t.withColumn("code", _pq_assign_expr(codebooks))
            # mean update by per-dim aggregate columns, not posexplode —
            # the _lloyd_step shape (sub_d = dim/m is always narrow, so
            # no wide-dim fallback is needed here)
            if sub_d <= _PER_DIM_AGG_CEILING:
                rows = (
                    assigned.groupBy("sub", "code")
                    .agg(
                        *[
                            F.avg(F.element_at("sv", p + 1)).alias(f"m{p}")
                            for p in range(sub_d)
                        ]
                    )
                    .collect()
                )
                means2 = {
                    (r["sub"], r["code"]): [r[f"m{p}"] for p in range(sub_d)]
                    for r in rows
                }
                codebooks = [
                    [
                        # empty cluster keeps its centroid
                        means2.get((s, c), codebooks[s][c])
                        for c in range(k_sub)
                    ]
                    for s in range(m)
                ]
                continue
            cell = (
                assigned.select("sub", "code", F.posexplode("sv").alias("pos", "x"))
                .groupBy("sub", "code", "pos")
                .agg(F.avg("x").alias("mv"))
                .collect()
            )
            means: dict[tuple[int, int], dict[int, float]] = {}
            for r in cell:
                means.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mv"]
            codebooks = [
                [
                    [means[(s, c)][p] for p in sorted(means[(s, c)])]
                    if (s, c) in means
                    else codebooks[s][c]  # empty cluster keeps its centroid
                    for c in range(k_sub)
                ]
                for s in range(m)
            ]
    finally:
        if train_fraction is not None:
            t.unpersist()
    return codebooks


def _argmin_code(sv: Column, codebook: list[list[float]]) -> Column:
    """argmin squared-L2 of ``sv`` against the codebook literals, ties to
    the lowest code — THE deterministic assignment rule (shared by fit,
    encode, and the plain k-means `_assign_nearest`, so the tie-break
    contract the numpy differential tests pin lives in one place).

    The codebook rides ONE nested array-literal node
    (:func:`_lit_array`) and the per-code distances come from the same
    ``transform`` fold as the broadcast matrix path
    (:func:`_argmin_code_from_matrix` — the two shapes are pinned equal
    in tests/test_kmeans_ivf.py).  The old unrolled per-code expression
    array cost O(k_sub·dim) py4j round-trips — PYTHON-side plan
    construction, not Spark execution, was 8-14 s per pq_fit iteration
    in the round-15 profile."""
    return _argmin_code_from_matrix(sv, _lit_array(codebook))


def _pq_assign_expr(codebooks: list[list[list[float]]]) -> Column:
    """code = argmin squared-L2 of `sv` against this row's `sub` codebook
    (one nested literal; ties to the lowest code).  Pure JVM exprs.
    Literal path — callers switch to the broadcast matrix shape past
    ``_ASSIGN_LITERAL_CEILING`` (see :func:`_codebook_matrix_df`); both
    index the same per-sub codebook and share the
    :func:`_argmin_code_from_matrix` fold, so the assignments agree
    bit-for-bit."""
    return _argmin_code_from_matrix(
        F.col("sv"), F.element_at(_lit_array(codebooks), F.col("sub") + F.lit(1))
    )


def _codebook_matrix_df(spark, codebooks: list[list[list[float]]]):
    """The whole PQ codebook as ONE broadcast row (`cbs[sub][code] →
    centroid`) — the large-k_sub·dim shape where inlining every centroid
    as expression literals (k_sub·D doubles, e.g. 196k at k_sub=256,
    D=768) would slow analysis and fall out of codegen.  Same design as
    the k-means matrix path in :func:`_assign_nearest`."""
    return spark.createDataFrame(
        [([[list(c) for c in cb] for cb in codebooks],)],
        "cbs array<array<array<double>>>",
    )


def _argmin_code_from_matrix(sv: Column, cb_entries: Column) -> Column:
    """argmin squared-L2 of ``sv`` against a codebook COLUMN
    (array<array<double>>), ties to the lowest code — the matrix twin of
    :func:`_argmin_code` (F.transform's 2-arg lambda index IS the code)."""
    return F.array_min(
        F.transform(
            cb_entries,
            lambda cv, c: F.struct(
                F.aggregate(
                    F.zip_with(sv, cv, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                c.alias("code"),
            ),
        )
    )["code"]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: bool = False,
) -> DataFrame:
    """(id, pq_codes array<int> of length m): one map-side pass, no
    shuffle — the 32× storage-compression write for the corpus.  Past
    ``_ASSIGN_LITERAL_CEILING`` literal doubles (k_sub·D total) the
    codebook rides one broadcast row instead of the expression tree —
    still map-side, zero shuffle.  ``keep_cols=True`` keeps every input
    column alongside ``pq_codes`` (so a caller that also carries e.g. an
    IVF bucket never needs a corpus-scale self-join to recombine)."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    v = as_double(F.col(vec_col))
    base = [F.col(c) for c in df.columns] if keep_cols else [F.col(id_col)]
    # STAGE the cast vector and its m subvector slices as real columns
    # before the per-code distance expressions reference them: an
    # expression captured inside a higher-order-function lambda is
    # re-evaluated once per element (HOFs sit outside codegen;
    # subexpression elimination doesn't reach lambda bodies), and even
    # on the literal path each of the m·k_sub distance folds re-ran the
    # O(D) cast+slice chain — staged columns bind as O(1) attribute
    # reads (the remove_repeated_spans / _assign_nearest "v" staging
    # pattern), leaving only the O(m·k_sub·sub_d) distance arithmetic.
    clash = [c for c in df.columns if c in ("_pq_v", "_pq_subs", "cbs")]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with pq_encode temporaries "
            "— rename or drop them first"
        )
    staged = df.withColumn("_pq_v", v).withColumn(
        "_pq_subs",
        F.array(*[
            F.slice("_pq_v", s * sub_d + 1, sub_d) for s in range(m)
        ]),
    )
    # total literal doubles across the m argmin expressions = k_sub · D
    if len(codebooks[0]) * sub_d * m > _ASSIGN_LITERAL_CEILING:
        staged = staged.crossJoin(
            F.broadcast(_codebook_matrix_df(df.sparkSession, codebooks))
        )
        return staged.select(
            *base,
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: _argmin_code_from_matrix(
                    F.element_at("_pq_subs", s + F.lit(1)),
                    F.element_at("cbs", s + F.lit(1)),
                ),
            ).alias("pq_codes"),
        )
    return staged.select(
        *base,
        F.array(*[
            _argmin_code(
                F.col("_pq_subs")[s],
                codebooks[s],
            )
            for s in range(m)
        ]).alias("pq_codes"),
    )


def pq_decode(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Reconstruct the PQ approximation (id, v_approx): concatenate each
    sub-code's centroid.  Map-side; the reranking/verification read."""
    m = len(codebooks)
    parts = []
    for s in range(m):
        # one nested array-literal node per subspace (see _lit_array)
        cb = _lit_array(codebooks[s])
        parts.append(F.element_at(cb, F.col(codes_col)[s] + 1))
    return codes_df.select(
        F.col(id_col), F.concat(*parts).alias("v_approx")
    )


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    broadcast_queries: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Asymmetric Distance Computation top-k: exact queries against the
    PQ-compressed corpus.

    Per query the (sub, code) → squared-distance LOOKUP TABLE has m·k_sub
    entries; it is built as a crossJoin of the query set with the
    m·k_sub-row codebook relation, then the corpus codes join it per
    subspace and sum m terms per (query, id): O(N·m) JVM work per query
    instead of O(N·D) — with m ≪ D this is the PQ speedup, before any IVF
    pruning shrinks N.  Returns (query_id, rank, neighbor_id, adc_dist)
    with ranks 1..k by ascending approximate squared L2 (id tie-break).

    ``broadcast_queries=True`` (interactive workloads) broadcasts the
    Q·m·k_sub distance table to every executor — right while it fits a
    broadcast (e.g. 1k queries × 8 × 256 = 2M rows).  Set False for the
    MID-SIZE regime: a query set too large to broadcast but still small
    against the corpus.  The table then stays distributed; because
    (sub, code) alone has only m·k_sub distinct values (a parallelism
    ceiling, with every query's rows in every key group), the corpus side
    takes ``salt = hash(id) % salt_buckets`` and the table is replicated
    ``salt_buckets`` ways, fanning the shuffle out to
    m·k_sub·salt_buckets balanced groups.  Replicating the table costs
    salt_buckets·Q·m·k_sub shuffled rows, so this path is the right
    trade only while Q ≪ N/(salt_buckets·k_sub) — beyond that ADC against
    the whole corpus is inherently O(N·Q) work no matter the plan, and
    the scale answer is pruning N FIRST (assign queries to IVF buckets
    via :func:`ivf_topk_kmeans`-style probing and run ADC per bucket),
    not a bigger join."""
    m = len(codebooks)
    spark = codes_df.sparkSession
    cb_rows = [
        (s, c, list(vec))
        for s, cb in enumerate(codebooks)
        for c, vec in enumerate(cb)
    ]
    cb_df = spark.createDataFrame(
        cb_rows, "sub int, code int, centroid array<double>"
    )
    sub_d = len(codebooks[0][0])
    q = queries.select(
        F.col(query_id_col), as_double(F.col(query_vec_col)).alias("qv")
    )
    # distance table: Q × m × k_sub rows
    dtab = (
        q.crossJoin(F.broadcast(cb_df))
        .select(
            query_id_col,
            "sub",
            "code",
            F.aggregate(
                F.zip_with(
                    F.slice("qv", F.col("sub") * sub_d + 1, sub_d),
                    F.col("centroid"),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
    )
    exploded = codes_df.select(
        F.col(id_col), F.posexplode("pq_codes").alias("sub", "code")
    )
    if broadcast_queries:
        joined = exploded.join(F.broadcast(dtab), ["sub", "code"])
    else:
        salted = exploded.withColumn(
            "salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        dtab_rep = dtab.withColumn(
            "salt",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
                )
            ),
        )
        joined = salted.join(dtab_rep, ["sub", "code", "salt"])
    scored = joined.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("d"), 6).alias("adc_dist")
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "adc_dist")
    )


def rerank_topk(
    shortlist: DataFrame,
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    neighbor_col: str = "neighbor_id",
    broadcast_shortlist: bool = True,
) -> DataFrame:
    """Exact re-ranking of an approximate shortlist — the refine step of
    the standard FAISS IVFPQ+refine recipe: run :func:`ivfpq_topk` /
    :func:`pq_adc_topk` with ``k = shortlist_k > k`` (the recall knob),
    then re-score ONLY those candidates against their original
    full-precision vectors and keep the exact top ``k``.

    ``shortlist`` needs (``query_id_col``, ``neighbor_col``) — extra
    columns (rank, adc_dist) are ignored.  ``metric``: ``"cosine"``
    (descending, column ``cosine`` — :func:`brute_topk`'s contract) or
    ``"l2"`` (ascending squared L2, column ``l2_dist``).  Ties break on
    ascending neighbor id; scores round to 6 decimals (engine parity).

    Scale shape: the shortlist is Q·shortlist_k (id, id) pairs —
    metadata-scale next to the corpus — so with the default
    ``broadcast_shortlist=True`` it broadcasts into the corpus scan and
    candidate vectors are pulled in ONE map-side pass (no corpus
    shuffle); the candidate relation (Q·shortlist_k rows with vectors)
    then equi-joins the query vectors on ``query_id``.  Set
    ``broadcast_shortlist=False`` for corpus-scale query sets: both the
    candidate pull and the query join become shuffle equi-joins keyed on
    ids — never a cartesian, never a full-corpus score."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    pairs = shortlist.select(
        F.col(query_id_col), F.col(neighbor_col)
    ).distinct()
    # norms once per candidate/query vector, carried through the joins,
    # not re-folded per (query, neighbor) pair: round(dot/(nq*nv), 6) is
    # bit-equal to the inline cosine (same fold over the same array) —
    # the brute_topk/ivf_topk note applied to the refine leg
    v = df.select(
        F.col(id_col).alias(neighbor_col), as_double(F.col(vec_col)).alias("v")
    )
    if metric == "cosine":
        v = v.select(neighbor_col, "v", norm(F.col("v")).alias("_nv"))
    pair_side = F.broadcast(pairs) if broadcast_shortlist else pairs
    cand = v.join(pair_side, neighbor_col)
    q = queries.select(
        F.col(query_id_col), as_double(F.col(query_vec_col)).alias("qv")
    )
    if metric == "cosine":
        q = q.select(query_id_col, "qv", norm(F.col("qv")).alias("_nq"))
    q_side = F.broadcast(q) if broadcast_shortlist else q
    joined = cand.join(q_side, query_id_col)
    if metric == "cosine":
        score = F.round(
            dot(F.col("qv"), F.col("v")) / (F.col("_nq") * F.col("_nv")), 6
        ).alias("cosine")
        order = [F.col("cosine").desc(), F.col(neighbor_col).asc()]
    else:
        score = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
            6,
        ).alias("l2_dist")
        order = [F.col("l2_dist").asc(), F.col(neighbor_col).asc()]
    scored = joined.select(query_id_col, neighbor_col, score)
    w = W.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", neighbor_col, scored.columns[-1])
    )


def validate_ann_artifacts(
    df: DataFrame,
    vec_col: str,
    centroids: "list[tuple[int, list[float]]] | None",
    codebooks: "list[list[list[float]]] | None",
) -> None:
    """Up-front validation of caller-injected ANN artifacts — a dimension
    mismatch would NULL-poison every zip_with distance silently (the
    semantic_dedup dim lesson).  Empty artifact lists are rejected
    explicitly (they'd otherwise surface as IndexError here or as an
    always-empty search later).  When the corpus is EMPTY its dim can't be
    probed; the artifacts are then cross-validated against each other and
    a warning is emitted instead of silently skipping — a mismatch would
    otherwise slip through to a later non-empty run.  Callers injecting
    artifacts should note the fit parameters (n_clusters/m/k_sub/iters/
    train_fraction) are ignored for whichever artifact is injected."""
    if centroids is not None and not centroids:
        raise ValueError("injected centroids list is empty")
    if codebooks is not None and (
        not codebooks or any(not cb or not cb[0] for cb in codebooks)
    ):
        raise ValueError("injected codebooks are empty or have an empty subspace")
    cb_dim = (
        len(codebooks) * len(codebooks[0][0]) if codebooks is not None else None
    )
    cent_dim = len(centroids[0][1]) if centroids is not None else None
    if cent_dim is not None and cb_dim is not None and cent_dim != cb_dim:
        raise ValueError(
            f"injected centroids (dim {cent_dim}) and codebooks (dim "
            f"{cb_dim}) disagree with each other"
        )
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    corpus_dim = dim_row[0]["d"] if dim_row else None
    if corpus_dim is None:
        import warnings

        warnings.warn(
            f"corpus {vec_col!r} is empty — injected ANN artifact "
            "dimensions cannot be validated against it",
            RuntimeWarning,
            stacklevel=3,
        )
        return
    if cent_dim is not None and cent_dim != corpus_dim:
        raise ValueError(
            f"injected centroids have dim {cent_dim}, "
            f"corpus {vec_col!r} has dim {corpus_dim}"
        )
    if cb_dim is not None and cb_dim != corpus_dim:
        raise ValueError(
            f"injected codebooks cover dim {cb_dim} "
            f"({len(codebooks)} subspaces × "
            f"{len(codebooks[0][0])}), corpus {vec_col!r} has "
            f"dim {corpus_dim}"
        )


def ivfpq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    train_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    centroids: "list[tuple[int, list[float]]] | None" = None,
    codebooks: "list[list[list[float]]] | None" = None,
) -> DataFrame:
    """IVF + PQ composed search — the FAISS ``IVFPQ`` shape and the
    production path for corpus-scale query sets that plain
    :func:`pq_adc_topk` cannot serve (its docstring's "prune N first").
    Pass prefitted ``centroids``/``codebooks`` to reuse an existing index
    (repeat query batches must not refit — and MUST not, for results to
    be comparable across batches); omitted ones are fit here:

    1. coarse quantizer: k-means buckets over the corpus (sampled
       training via ``train_fraction``), ONE assignment pass;
    2. PQ-compress every vector (one map-side encode);
    3. each query probes its ``n_probe`` nearest coarse buckets and runs
       asymmetric-distance scoring ONLY against those buckets' codes —
       the join key is (bucket, sub, code) with cardinality
       n_clusters·m·k_sub, keeping parallelism without salting.

    Shuffle caveat: the "only probed codes move" property holds WHILE the
    Q·n_probe·m·k_sub distance table fits a broadcast (AQE auto-broadcast
    under ``spark.sql.autoBroadcastJoinThreshold``) — the corpus side is
    then filtered map-side by the broadcast hash join.  With a
    corpus-scale query set the equi-join shuffles the FULL exploded
    corpus (m× amplified), probed or not, because this in-memory variant
    re-encodes from raw embeddings and has no physical layout to prune
    against.  The corpus-scale shape is the MATERIALIZED index:
    :func:`chronicles_spark.operators.ann_index.build_ann_index` writes
    (id, pq_codes) partitioned by bucket as a versioned table, and
    :func:`~chronicles_spark.operators.ann_index.ivfpq_topk_indexed`
    prunes probes at the SCAN — unprobed buckets are never read at all.

    Returns (query_id, rank, neighbor_id, adc_dist), ranks 1..k by
    ascending approximate squared L2 with id tie-break.  Exact
    re-ranking of the k survivors against original vectors is one
    ordinary join away and deliberately not folded in (the caller may
    re-rank a larger shortlist).  Recall bound: a true neighbor whose
    bucket is not probed is missed — the IVF trade, tuned via
    (n_clusters, n_probe)."""
    if centroids is not None or codebooks is not None:
        validate_ann_artifacts(df, vec_col, centroids, codebooks)
    if centroids is None:
        centroids = kmeans_fit(
            df, n_clusters, iters, id_col, vec_col, train_fraction=train_fraction
        )
    if codebooks is None:
        codebooks = pq_fit(
            df, m, k_sub, iters, id_col, vec_col, train_fraction=train_fraction
        )
    # bucket AND codes in ONE map-side pass over a single corpus scan —
    # bucketing then joining a separate encode would shuffle the whole
    # corpus through a self-join before any probing happens
    vd = df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    corpus = pq_encode(
        _assign_nearest(vd, centroids).withColumnRenamed("cluster", "bucket"),
        codebooks,
        id_col=id_col,
        vec_col="v",
        keep_cols=True,
    ).select(
        F.col(id_col), "bucket", F.posexplode("pq_codes").alias("sub", "code")
    )
    probes = select_probes(queries, centroids, n_probe, query_id_col, query_vec_col)
    return adc_over_probes(corpus, probes, codebooks, k, id_col, query_id_col)


def select_probes(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_probe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """(query_id, qv, bucket) — each query's ``n_probe`` nearest coarse
    buckets by squared L2, ties to the lowest bucket id.  The centroid
    side is always a tiny k·dim broadcast; the window partitions by query,
    so probe selection parallelizes with the query set."""
    q = queries.select(
        F.col(query_id_col), as_double(F.col(query_vec_col)).alias("qv")
    )
    cents_df = q.sparkSession.createDataFrame(
        [(cid, list(c)) for cid, c in centroids], "bucket int, cv array<double>"
    )
    qc = q.crossJoin(F.broadcast(cents_df)).select(
        query_id_col, "qv", "bucket",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("cd"),
    )
    wq = W.partitionBy(query_id_col).orderBy(F.col("cd").asc(), F.col("bucket").asc())
    return (
        qc.withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") <= n_probe)
        .select(query_id_col, "qv", "bucket")
    )


def adc_over_probes(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance scoring of a probed corpus slice: ``corpus`` is
    the exploded (id, bucket, sub, code) relation, ``probes`` is
    :func:`select_probes`'s output.  The per-(query, probed bucket)
    distance table has Q·n_probe·m·k_sub rows and joins the corpus on
    (bucket, sub, code) — key cardinality n_clusters·m·k_sub keeps
    parallelism without salting.

    No self-exclusion: queries are an INDEPENDENT relation whose id space
    is unrelated to the corpus (same contract as :func:`pq_adc_topk`) —
    filtering ``vec_id == query_id`` would silently drop unrelated
    neighbors, and a caller searching the corpus against itself can
    exclude the trivial match afterwards."""
    sub_d = len(codebooks[0][0])
    cb_df = probes.sparkSession.createDataFrame(
        [
            (s, c, list(vec))
            for s, cb in enumerate(codebooks)
            for c, vec in enumerate(cb)
        ],
        "sub int, code int, centroid array<double>",
    )
    dtab = probes.crossJoin(F.broadcast(cb_df)).select(
        query_id_col, "bucket", "sub", "code",
        F.aggregate(
            F.zip_with(
                F.slice("qv", F.col("sub") * sub_d + 1, sub_d),
                F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("d"),
    )
    scored = (
        corpus.join(dtab, ["bucket", "sub", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "adc_dist")
    )
