"""Round-7 ANN additions: the companion (id -> bucket) map that makes
upsert locates O(batch), the bucket-skew guard, and recall measurement.

House-style differentials:
* the SAME operation sequence driven through a mapped index and an
  unmapped index (full-scan locate) must land byte-identical contents —
  the locate path is an implementation detail, never a semantics change;
* seeded fuzz incl. moved buckets, verify_ann_id_map after every step;
* skew-guarded build == unguarded build at the search surface;
* recall@k re-derived with numpy.
"""

import os
import random

import numpy as np
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


def _mk_index(spark, tmp_path, name, **kw):
    tracker = FileBackedVersionTracker(str(tmp_path / f"_log_{name}"))
    table = TableDefinition(
        TableName("demo", name), str(tmp_path / name),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    return table, tracker


def _contents(spark, table, tracker):
    from chronicles_spark.spark import read_current

    return sorted(
        (r["vec_id"], r["bucket"], tuple(r["pq_codes"]))
        for r in read_current(spark, table, tracker).collect()
    )


@pytest.mark.slow
def test_mapped_and_unmapped_extends_land_identical_indexes(spark, tmp_path):
    """Seeded fuzz: the same build + mixed upsert/append sequence through
    (a) an index WITH the id map (bounded locate) and (b) one WITHOUT
    (full-scan locate) must produce byte-identical index contents at
    every step, with the map staying consistent throughout — including
    re-submissions that MOVE ids between buckets."""
    emb = load_table(spark, SF_DIR, "embeddings")
    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.limit(40).collect()
    }
    ids = sorted(vecs)
    ta, tra = _mk_index(spark, tmp_path, "mapped")
    tb, trb = _mk_index(spark, tmp_path, "flat")
    base = emb.where(F.col("vec_id").isin(ids[:24]))
    _, arts_a = AX.build_ann_index(
        base, ta, tra, n_clusters=4, m=4, k_sub=4, iters=1, id_map_shards=5
    )
    _, arts_b = AX.build_ann_index(
        base, tb, trb, n_clusters=4, m=4, k_sub=4, iters=1, id_map_shards=None
    )
    assert arts_a.id_shards == 5 and arts_b.id_shards is None
    assert _contents(spark, ta, tra) == _contents(spark, tb, trb)
    assert AX.verify_ann_id_map(spark, ta, tra).count() == 0

    rng = random.Random(7)
    existing = set(ids[:24])
    fresh = list(ids[24:])
    for step in range(4):
        if step % 2 == 0:
            # upsert: re-submit existing ids carrying OTHER rows' vectors
            # (forces bucket moves), plus one genuinely new id
            res = rng.sample(sorted(existing), 3)
            donors = rng.sample(ids, 3)
            rows = [(i, vecs[d]) for i, d in zip(res, donors)]
            if fresh:
                nid = fresh.pop()
                rows.append((nid, vecs[nid]))
                existing.add(nid)
            mode = "upsert"
        else:
            nid = fresh.pop()
            rows = [(nid, vecs[nid])]
            existing.add(nid)
            mode = "append"
        batch = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        AX.extend_ann_index(batch, ta, tra, mode=mode)
        AX.extend_ann_index(batch, tb, trb, mode=mode)
        assert _contents(spark, ta, tra) == _contents(spark, tb, trb), (
            f"diverged at step {step} ({mode})"
        )
        assert AX.verify_ann_id_map(spark, ta, tra).count() == 0, (
            f"id map inconsistent at step {step}"
        )
        # no stale twins anywhere
        from chronicles_spark.spark import read_current

        dup = (
            read_current(spark, ta, tra)
            .groupBy("vec_id").count().where(F.col("count") > 1).count()
        )
        assert dup == 0


@pytest.mark.slow
def test_locate_reads_only_batch_shards(spark, tmp_path):
    """The O(batch) claim, pinned on real paths: the map partitions an
    upsert's locate COULD read are exactly the batch's shard partitions
    — a strict subset of the map's live shards for a small batch."""
    emb = load_table(spark, SF_DIR, "embeddings")
    table, tracker = _mk_index(spark, tmp_path, "prune")
    _, arts = AX.build_ann_index(
        emb, table, tracker, n_clusters=4, m=4, k_sub=4, iters=1,
        id_map_shards=16,
    )
    map_table = AX.ann_id_map_table(table)
    map_state = tracker.current_version(map_table.name)
    all_shards = sorted(
        dict(p.column_values)["id_shard"]
        for p in map_state.partition_versions
    )
    assert len(all_shards) > 2  # fixture big enough to discriminate
    one = spark.createDataFrame(
        [(0, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    batch_shards = sorted(
        r["s"]
        for r in one.select(
            AX._shard_col("vec_id", arts.id_shards).alias("s")
        ).distinct().collect()
    )
    assert len(batch_shards) == 1
    sub = AX._restrict_to_values(map_state, AX.ID_SHARD_COL, batch_shards)
    pruned = {
        dict(p.column_values)["id_shard"] for p in sub.partition_versions
    }
    assert pruned <= set(batch_shards)
    assert len(pruned) < len(all_shards)  # strict pruning


@pytest.mark.slow
def test_skew_guard_caps_partitions_and_keeps_search_identical(spark, tmp_path):
    """max_bucket_rows: a deliberately skewed corpus (every vector near
    one centroid) keeps every physical partition at or under the cap,
    while the indexed search stays byte-identical to the unguarded
    build's under the same artifacts, and the probe-path audit still
    prunes (logical probe reads exactly its sub-partitions)."""
    from chronicles_spark.spark import read_current

    dim = 8
    rows = [
        (i, [float(i % 7) / 100.0] * dim)  # all near the origin: one mega-bucket
        for i in range(120)
    ]
    skewed = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [0.0] * dim), (1, [100.0] * dim)]
    books = [[[0.0] * 4, [100.0] * 4]] * 2

    tg, trg = _mk_index(spark, tmp_path, "guarded")
    tu, tru = _mk_index(spark, tmp_path, "unguarded")
    stg, arts = AX.build_ann_index(
        skewed, tg, trg, centroids=cents, codebooks=books,
        max_bucket_rows=25, id_map_shards=4,
    )
    AX.build_ann_index(
        skewed, tu, tru, centroids=cents, codebooks=books, id_map_shards=4,
    )

    # every physical partition holds <= cap rows, and bucket 0 was split
    per_part = {
        r["bucket"]: r["n"]
        for r in read_current(spark, tg, trg)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert max(per_part.values()) <= 25
    assert any("_" in b for b in per_part)
    assert AX.verify_ann_id_map(spark, tg, trg).count() == 0

    q = spark.createDataFrame(
        [(900, [0.01] * dim)], "query_id long, qv array<float>"
    )
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, tg, trg, q, k=5, n_probe=1
    ).collect()))
    want = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, tu, tru, q, k=5, n_probe=1
    ).collect()))
    assert got == want and got

    # scan-prune audit across the split: probing logical bucket 0 reads
    # all (and only) 0's sub-partitions
    allowed = AX.probed_bucket_paths(tg, stg, ["0"])
    assert allowed and all("/bucket=0" in p for p in allowed)
    res = AX.ivfpq_topk_indexed(spark, tg, trg, q, k=5, n_probe=1)
    files = [
        f.removeprefix("file://")
        for f in res.inputFiles()
        if tg.location in f.removeprefix("file://")
    ]
    assert files and all(any(f.startswith(a) for a in allowed) for f in files)

    # extends place new rows inside the live sub-layout (cap respected
    # for a batch that would otherwise re-inflate the mega-bucket)
    batch = spark.createDataFrame(
        [(500 + i, [0.02] * dim) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    AX.extend_ann_index(batch, tg, trg)
    after = {
        r["bucket"]
        for r in read_current(spark, tg, trg).select("bucket").distinct().collect()
    }
    assert all("_" in b for b in after if b.startswith("0"))
    assert AX.verify_ann_id_map(spark, tg, trg).count() == 0

    # cap ENFORCEMENT on extend: the cap rides the sidecar, and an
    # extend whose rewrite grows touched physical partitions past it
    # re-splits them IN the same commit (nested suffixes) — the cap is
    # a hard layout invariant, not a drift warning
    resolved = AX.load_ann_artifacts(tg, trg.current_version(tg.name))
    assert resolved.max_bucket_rows == 25
    assert resolved.bucket_splits is not None  # build recorded its tree
    # the build's overshoot-doubling converged to a modulus of tens of
    # subs, so the flood must be large enough to push SOME sub past the
    # cap (cap × modulus rows all landing in logical bucket 0)
    n_subs = sum(1 for b in after if b.startswith("0_"))
    flood = spark.createDataFrame(
        [(700 + i, [0.03] * dim) for i in range(25 * n_subs + 5 * n_subs)],
        "vec_id long, embedding array<float>",
    )
    AX.extend_ann_index(flood, tg, trg)
    post = {
        r["bucket"]: r["n"]
        for r in read_current(spark, tg, trg)
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert max(post.values()) <= 25
    assert any(b.count("_") >= 2 for b in post)  # nested re-split happened
    assert AX.verify_ann_id_map(spark, tg, trg).count() == 0
    # the nested entries rode the extend's sidecar
    resolved2 = AX.load_ann_artifacts(tg, trg.current_version(tg.name))
    nested = [k for k, _ in resolved2.bucket_splits if "_" in k]
    assert nested


@pytest.mark.slow
def test_rebuild_ann_id_map_repairs_divergence(spark, tmp_path):
    """Simulated files-backend crash (map head rolled back one commit):
    verify_ann_id_map flags the divergence, rebuild_ann_id_map repairs
    it, and the next upsert behaves correctly again."""
    emb = load_table(spark, SF_DIR, "embeddings")
    table, tracker = _mk_index(spark, tmp_path, "crashy")
    _, arts = AX.build_ann_index(
        emb, table, tracker, n_clusters=4, m=4, k_sub=4, iters=1,
        id_map_shards=4,
    )
    donor = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    moved = spark.createDataFrame(
        [(0, list(donor))], "vec_id long, embedding array<float>"
    )
    AX.extend_ann_index(moved, table, tracker)
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0

    # crash simulation: the index commit landed, the map commit "didn't"
    map_table = AX.ann_id_map_table(table)
    updates = tracker.table_state(map_table.name).updates
    tracker.set_current_version(
        map_table.name, updates[-2].metadata.commit_id
    )
    assert AX.verify_ann_id_map(spark, table, tracker).count() > 0

    AX.rebuild_ann_id_map(spark, table, tracker)
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0

    # and the repaired map locates correctly: a second move of id 0 off
    # its current bucket leaves no stale twin
    donor2 = emb.where(F.col("vec_id") == 3).collect()[0]["embedding"]
    moved2 = spark.createDataFrame(
        [(0, list(donor2))], "vec_id long, embedding array<float>"
    )
    AX.extend_ann_index(moved2, table, tracker)
    from chronicles_spark.spark import read_current

    assert read_current(spark, table, tracker).where(
        F.col("vec_id") == 0
    ).count() == 1
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0


def test_rebuild_creates_map_for_unmapped_index(spark, tmp_path):
    """Migration path: an index built without a map gets one from
    rebuild_ann_id_map(artifacts=..., id_shards set); subsequent upserts
    must then pass artifacts carrying the same id_shards."""
    emb = load_table(spark, SF_DIR, "embeddings")
    table, tracker = _mk_index(spark, tmp_path, "migrate")
    _, arts = AX.build_ann_index(
        emb, table, tracker, n_clusters=4, m=4, k_sub=4, iters=1,
        id_map_shards=None, max_bucket_rows=1000,
    )
    with pytest.raises(ValueError, match="no id map"):
        AX.rebuild_ann_id_map(spark, table, tracker)
    arts_m = AX.AnnArtifacts(
        centroids=arts.centroids, codebooks=arts.codebooks,
        version_label=arts.version_label, id_shards=6,
    )
    AX.rebuild_ann_id_map(spark, table, tracker, artifacts=arts_m)
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0

    # migration completeness: the live sidecars were re-stamped, so an
    # extend with AUTO-resolved artifacts keeps maintaining the map
    # (without the re-stamp it would take the scan path and rot it)
    resolved = AX.load_ann_artifacts(
        table, tracker.current_version(table.name)
    )
    assert resolved.id_shards == 6
    # ... and ONLY id_shards changed: the recorded skew cap must survive
    # the re-stamp (erasing it would silently disable drift handling)
    assert resolved.max_bucket_rows == 1000
    donor = emb.where(F.col("vec_id") == 7).collect()[0]["embedding"]
    AX.extend_ann_index(
        spark.createDataFrame(
            [(0, list(donor))], "vec_id long, embedding array<float>"
        ),
        table, tracker,
    )
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0


def test_commit_group_conflict_leaves_nothing_committed(tmp_path):
    """Tracker-level: an optimistic group whose SECOND table conflicts
    must not land the first table's commit (all checks precede any
    append)."""
    from datetime import datetime, timezone

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion, TableUpdate, TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers.base import CommitConflictError

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    a = TableName("demo", "ga")
    b = TableName("demo", "gb")
    tracker.init_table(a, is_snapshot=False, user_id="t")
    tracker.init_table(b, is_snapshot=False, user_id="t")
    head_a = tracker.table_state(a).current_version
    head_b = tracker.table_state(b).current_version

    def upd(part_val):
        return TableUpdate(
            TableUpdateMetadata.new("t", "x", datetime.now(timezone.utc)),
            (AddPartitionVersion(
                Partition.of(("bucket", part_val)), generate_version()
            ),),
        )

    # move b's head so its pinned expectation conflicts (overlapping part)
    tracker.commit(b, upd("1"))
    with pytest.raises(CommitConflictError):
        tracker.commit_group(
            {a: upd("0"), b: upd("1")},
            expected_heads={a: head_a, b: head_b},
            allow_disjoint=True,
        )
    # nothing landed on a
    assert tracker.table_state(a).current_version == head_a
    # disjoint movement on b merges; the group lands on both
    tracker.commit_group(
        {a: upd("0"), b: upd("2")},
        expected_heads={a: head_a, b: head_b},
        allow_disjoint=True,
    )
    assert tracker.table_state(a).current_version != head_a


def test_ann_recall_at_k_matches_numpy(spark, tmp_path):
    """recall@k re-derived independently: numpy exact cosine top-k vs the
    operator's collected approx results."""
    emb = load_table(spark, SF_DIR, "embeddings")
    table, tracker = _mk_index(spark, tmp_path, "recall")
    _, arts = AX.build_ann_index(
        emb, table, tracker, n_clusters=4, m=4, k_sub=4, iters=1,
    )
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    k, shortlist_k = 5, 20
    got = {
        r["n_probe"]: r["recall"]
        for r in AX.ann_recall_at_k(
            spark, table, tracker, q, emb, k=k, n_probes=(1, 4),
            shortlist_k=shortlist_k,
        ).collect()
    }

    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    ids = sorted(data)
    mat = np.stack([data[i] for i in ids])
    norms = np.linalg.norm(mat, axis=1)
    for np_ in (1, 4):
        approx = AX.search_ann_index(
            spark, table, tracker, q, emb, k=k, shortlist_k=shortlist_k,
            n_probe=np_,
        ).collect()
        hits = total = 0
        for r in q.collect():
            qv = np.array(r["qv"], dtype=np.float64)
            cos = mat @ qv / (norms * np.linalg.norm(qv))
            order = sorted(
                range(len(ids)), key=lambda j: (-round(cos[j], 6), ids[j])
            )
            exact = {ids[j] for j in order[:k]}
            total += len(exact)
            mine = {
                a["neighbor_id"] for a in approx
                if a["query_id"] == r["query_id"]
            }
            hits += len(exact & mine)
        assert got[np_] == pytest.approx(hits / total, abs=1e-6)


@pytest.mark.slow
def test_sustained_hot_bucket_extends_keep_cap_without_rebuild(spark, tmp_path):
    """The round-7 `weak` closed: a sustained hot-bucket stream of
    extends keeps EVERY physical partition at or under the cap with NO
    rebuild — breached touched partitions re-split in-commit with
    nested suffixes — while search stays byte-identical to an unguarded
    twin, the probe prune audit holds across the nested split, and
    upserting an id that migrated into a nested partition leaves a
    single live copy."""
    from chronicles_spark.spark import read_current

    dim = 8
    cents = [(0, [0.0] * dim), (1, [100.0] * dim)]
    books = [[[0.0] * 4, [100.0] * 4]] * 2
    cap = 12
    tg, trg = _mk_index(spark, tmp_path, "hotg")
    tu, tru = _mk_index(spark, tmp_path, "hotu")
    seed = spark.createDataFrame(
        [(i, [float(i % 5) / 100.0] * dim) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    AX.build_ann_index(
        seed, tg, trg, centroids=cents, codebooks=books,
        max_bucket_rows=cap, id_map_shards=4,
    )
    AX.build_ann_index(
        seed, tu, tru, centroids=cents, codebooks=books, id_map_shards=4,
    )

    per = {}
    nxt = 100
    for _ in range(4):
        batch = spark.createDataFrame(
            [(nxt + i, [float((nxt + i) % 7) / 100.0] * dim) for i in range(15)],
            "vec_id long, embedding array<float>",
        )
        nxt += 15
        AX.extend_ann_index(batch, tg, trg)
        AX.extend_ann_index(batch, tu, tru)
        per = {
            r["bucket"]: r["n"]
            for r in read_current(spark, tg, trg)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert max(per.values()) <= cap, per
        assert AX.verify_ann_id_map(spark, tg, trg).count() == 0

    # the hot bucket went NESTED (depth >= 2) — enforcement, not rebuild
    assert any(b.count("_") >= 2 for b in per), per
    # guarded and unguarded twins hold the same logical contents
    assert sorted(
        (v, c) for v, _, c in _contents(spark, tg, trg)
    ) == sorted((v, c) for v, _, c in _contents(spark, tu, tru))

    # search byte-identical across the nested layout
    q = spark.createDataFrame(
        [(1, [0.01] * dim)], "query_id long, qv array<float>"
    )
    got = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, tg, trg, q, k=8, n_probe=1
    ).collect()))
    want = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, tu, tru, q, k=8, n_probe=1
    ).collect()))
    assert got == want and got

    # prune audit: probing logical bucket 0 reads only bucket=0 subtrees
    stg = trg.current_version(tg.name)
    allowed = AX.probed_bucket_paths(tg, stg, ["0"])
    assert allowed and all("/bucket=0" in p for p in allowed)
    res = AX.ivfpq_topk_indexed(spark, tg, trg, q, k=8, n_probe=1)
    files = [
        f.removeprefix("file://")
        for f in res.inputFiles()
        if tg.location in f.removeprefix("file://")
    ]
    assert files and all(any(f.startswith(a) for a in allowed) for f in files)

    # upsert an id now living in a NESTED partition: exactly one live
    # copy afterwards (the stale nested row is located through the
    # prefix-ancestor map entry and removed in the same commit)
    nested_id = next(
        r["vec_id"]
        for r in read_current(spark, tg, trg).collect()
        if r["bucket"].count("_") >= 2
    )
    AX.extend_ann_index(
        spark.createDataFrame(
            [(nested_id, [0.06] * dim)], "vec_id long, embedding array<float>"
        ),
        tg, trg,
    )
    assert read_current(spark, tg, trg).where(
        F.col("vec_id") == nested_id
    ).count() == 1
    assert AX.verify_ann_id_map(spark, tg, trg).count() == 0


def test_recorded_split_modulus_survives_emptied_highest_sub(spark, tmp_path):
    """The sidecar-recorded split tree is authoritative for placement:
    after an upsert empties (and removes) the HIGHEST sub-partition of
    a split bucket, a later extend still routes with the build's
    modulus — layout inference (max live suffix + 1) would shrink it
    and funnel new rows into fewer sub-partitions."""
    from chronicles_spark.spark import read_current

    dim = 8
    cents = [(0, [0.0] * dim), (1, [100.0] * dim)]
    books = [[[0.0] * 4, [100.0] * 4]] * 2
    table, tracker = _mk_index(spark, tmp_path, "modulus")
    seed = spark.createDataFrame(
        [(i, [float(i % 5) / 100.0] * dim) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    AX.build_ann_index(
        seed, table, tracker, centroids=cents, codebooks=books,
        max_bucket_rows=16, id_map_shards=4,
    )
    arts = AX.load_ann_artifacts(table, tracker.current_version(table.name))
    tree = dict(arts.bucket_splits)
    assert tree.get("0", 0) >= 2
    modulus = tree["0"]
    top = str(modulus - 1)

    # move every row of the highest sub-partition 0_<m-1> to bucket 1
    doomed = [
        r["vec_id"]
        for r in read_current(spark, table, tracker)
        .where(F.col("bucket") == f"0_{top}").collect()
    ]
    assert doomed
    AX.extend_ann_index(
        spark.createDataFrame(
            [(i, [100.0] * dim) for i in doomed],
            "vec_id long, embedding array<float>",
        ),
        table, tracker,
    )
    live = {
        dict(p.column_values)["bucket"]
        for p in tracker.current_version(table.name).partition_versions
    }
    assert f"0_{top}" not in live  # highest sub emptied and removed

    # a new id whose hash lands in the emptied sub must be placed THERE
    # (recorded modulus), not funneled into a lower sub
    probe_ids = list(range(1000, 1200))
    hashed = {
        r["i"]: str(r["s"])
        for r in spark.range(1000, 1200)
        .select(
            F.col("id").alias("i"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(modulus)).alias("s"),
        )
        .collect()
    }
    lands_top = next(i for i in probe_ids if hashed[i] == top)
    AX.extend_ann_index(
        spark.createDataFrame(
            [(lands_top, [0.01] * dim)], "vec_id long, embedding array<float>"
        ),
        table, tracker,
    )
    got = read_current(spark, table, tracker).where(
        F.col("vec_id") == lands_top
    ).collect()
    assert len(got) == 1 and got[0]["bucket"] == f"0_{top}"
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0


def test_torn_pair_fails_loudly_and_rebuild_repairs(spark, tmp_path):
    """Crash injection: kill the pair's group commit between its two
    appends (files backend — the index commit lands, the map's never
    does).  The NEXT extend must refuse loudly with TornAnnPairError —
    never locate through a map that does not describe the index — and
    rebuild_ann_id_map (itself pair-published) repairs the stamp so
    extends work again."""
    emb = load_table(spark, SF_DIR, "embeddings")
    table, tracker = _mk_index(spark, tmp_path, "torn")
    AX.build_ann_index(
        emb, table, tracker, n_clusters=4, m=4, k_sub=4, iters=1,
        id_map_shards=4,
    )

    # marker round-trip sanity
    stamped = AX._pair_message("extend", "v123")
    assert AX._pair_label(stamped) == "v123"
    assert AX._pair_label("plain message") is None

    calls = {"n": 0}
    orig = tracker._append_commit

    def boom(tbl, update):
        # the group appends in sorted table order: demo.torn (index)
        # first, demo.torn_ids (map) second — crash the second
        if calls["n"] == 1:
            raise RuntimeError("simulated crash between pair appends")
        calls["n"] += 1
        return orig(tbl, update)

    tracker._append_commit = boom
    donor = emb.where(F.col("vec_id") == 5).collect()[0]["embedding"]
    batch = spark.createDataFrame(
        [(0, list(donor))], "vec_id long, embedding array<float>"
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        AX.extend_ann_index(batch, table, tracker)

    # "restart": a fresh tracker over the same log sees the torn pair
    tracker2 = FileBackedVersionTracker(str(tmp_path / "_log_torn"))
    with pytest.raises(AX.TornAnnPairError, match="rebuild_ann_id_map"):
        AX.extend_ann_index(batch, table, tracker2)

    AX.rebuild_ann_id_map(spark, table, tracker2)
    assert AX.verify_ann_id_map(spark, table, tracker2).count() == 0
    AX.extend_ann_index(batch, table, tracker2)
    from chronicles_spark.spark import read_current

    assert read_current(spark, table, tracker2).where(
        F.col("vec_id") == 0
    ).count() == 1
    assert AX.verify_ann_id_map(spark, table, tracker2).count() == 0
