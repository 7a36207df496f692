"""Round-9: the incremental EMBEDDING dedup index
(operators/emb_dedup_index.py — the dedup_index family core with a
sign-LSH bander and exact-cosine verifier).

House-style differentials mirror tests/test_dedup_index.py:
* build-then-extend == one full embedding_lsh_dedup re-run over the
  same corpus, pair for pair and cosine for cosine — across multiple
  batches and across re-submissions that CHANGE a vector;
* verify_embedding_dedup_index (band rows re-derived from stored
  vectors) empty after every step;
* torn-pair crash injection (shared pairing.py protocol);
* rebuild re-geometry differential (shared core, embedding flavor).
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
    dedup_index as DX,
    emb_dedup_index as EX,
)
from chronicles_spark.operators.pairing import TornPairError
from chronicles_spark.sources import load_table
from chronicles_spark.trackers import FileBackedVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

DIM, PLANES, BANDS, THRESH = 64, 16, 4, 0.4


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


def _full_pairs(emb, where):
    return _pairs(
        DD.embedding_lsh_dedup(
            emb, dim=DIM, threshold=THRESH, n_planes=PLANES, bands=BANDS
        ).where(where)
    )


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")


@pytest.mark.slow
def test_incremental_equals_full_rerun(spark, tmp_path):
    """build(corpus) + extend(B1) + extend(B2) finds, across the base
    run and the two extends, exactly the pairs one full
    embedding_lsh_dedup over corpus∪B1∪B2 finds — same endpoints, same
    exact cosine."""
    emb = _emb(spark)
    corpus = emb.where("vec_id % 5 != 0")
    b1 = emb.where("vec_id % 5 = 0 AND vec_id < 400")
    b2 = emb.where("vec_id % 5 = 0 AND vec_id >= 400")

    table, tracker = _mk_index(tmp_path, "einc")
    EX.build_embedding_dedup_index(
        corpus, table, tracker, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=16, doc_shards=8,
    )
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0

    p1, _, _ = EX.extend_embedding_dedup_index(
        b1, table, tracker, threshold=THRESH
    )
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0
    p2, _, _ = EX.extend_embedding_dedup_index(
        b2, table, tracker, threshold=THRESH
    )
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0

    base_pairs = _full_pairs(corpus, "1=1")
    got = sorted(base_pairs + _pairs(p1) + _pairs(p2))
    want = _full_pairs(emb, "1=1")
    assert got == want and want  # fixture has known near-dups

    # each extend reported exactly the pairs its batch introduced
    assert _pairs(p1) == _full_pairs(
        emb.where("vec_id % 5 != 0 OR vec_id < 400"),
        "(id_a % 5 = 0 AND id_a < 400) OR (id_b % 5 = 0 AND id_b < 400)",
    )


def test_resubmission_replaces_vector(spark, tmp_path):
    """Upsert semantics: re-submitting an id with a NEW vector replaces
    its band rows and stored embedding — the incremental result equals a
    full re-run over the UPDATED corpus, and the stale vector never
    pairs.  The re-submitted vector MOVES band buckets (donor ≠
    original), exercising the old-bucket removal path."""
    emb = _emb(spark)
    corpus = emb.where("vec_id < 200")
    table, tracker = _mk_index(tmp_path, "eresub")
    EX.build_embedding_dedup_index(
        corpus, table, tracker, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=16, doc_shards=8,
    )

    donor11 = corpus.where("vec_id = 11").collect()[0]["embedding"]
    donor13 = corpus.where("vec_id = 13").collect()[0]["embedding"]
    batch = spark.createDataFrame(
        [(7, donor11), (900, donor13)], "vec_id long, embedding array<float>"
    )
    pairs, _, _ = EX.extend_embedding_dedup_index(
        batch, table, tracker, threshold=THRESH
    )
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0

    updated = corpus.where("vec_id <> 7").unionByName(batch)
    want = _full_pairs(updated, "id_a IN (7, 900) OR id_b IN (7, 900)")
    assert _pairs(pairs) == want
    assert (7, 11, 1.0) in _pairs(pairs)

    # the index state equals a from-scratch build over the updated corpus
    table2, tracker2 = _mk_index(tmp_path, "eresub2")
    EX.build_embedding_dedup_index(
        updated, table2, tracker2, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=16, doc_shards=8,
    )
    from chronicles_spark.spark.reader import read_version

    def contents(t, tr):
        st = tr.current_version(t.name)
        return sorted(
            map(tuple, read_version(spark, t, st, infer_partition_types=False)
                .select("vec_id", "band_id", "band_key").collect())
        )

    assert contents(table, tracker) == contents(table2, tracker2)


@pytest.mark.slow
def test_rebuild_regeometry(spark, tmp_path):
    """rebuild_embedding_dedup_index re-shards (and re-bands) in place:
    after the rebuild the index equals a from-scratch build under the
    new geometry, the offline verify is empty, old-geometry partitions
    are gone from the live view, and extends keep agreeing with the
    full re-run under the NEW banding."""
    emb = _emb(spark)
    corpus = emb.where("vec_id < 400")
    table, tracker = _mk_index(tmp_path, "eregeo")
    EX.build_embedding_dedup_index(
        corpus, table, tracker, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=8, doc_shards=4,
    )
    EX.extend_embedding_dedup_index(
        emb.where("vec_id >= 400 AND vec_id < 450"), table, tracker,
        threshold=THRESH,
    )

    _, arts = EX.rebuild_embedding_dedup_index(
        spark, table, tracker, bands=8, band_shards=16, doc_shards=8,
    )
    assert (arts.bands, arts.band_shards, arts.doc_shards) == (8, 16, 8)
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0
    state = tracker.current_version(table.name)
    assert EX.load_embedding_dedup_artifacts(table, state).geometry() == (
        arts.geometry()
    )
    # every live partition carries the rebuild's label (old geometry gone)
    assert {v.label for v in state.partition_versions.values()} == {
        arts.version_label
    }

    # equality with a from-scratch build under the new geometry
    upto_450 = emb.where("vec_id < 450")
    table2, tracker2 = _mk_index(tmp_path, "eregeo2")
    EX.build_embedding_dedup_index(
        upto_450, table2, tracker2, dim=DIM, n_planes=PLANES, bands=8,
        band_shards=16, doc_shards=8,
    )
    from chronicles_spark.spark.reader import read_version

    def contents(t, tr):
        st = tr.current_version(t.name)
        return sorted(
            map(tuple, read_version(spark, t, st, infer_partition_types=False)
                .select("vec_id", "band_id", "band_key", "band_shard")
                .collect())
        )

    assert contents(table, tracker) == contents(table2, tracker2)

    # extends after the rebuild agree with the full re-run at 8 bands
    p, _, _ = EX.extend_embedding_dedup_index(
        emb.where("vec_id >= 450"), table, tracker, threshold=THRESH
    )
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0
    want = _pairs(
        DD.embedding_lsh_dedup(
            emb, dim=DIM, threshold=THRESH, n_planes=PLANES, bands=8
        ).where("id_a >= 450 OR id_b >= 450")
    )
    assert _pairs(p) == want


def test_torn_pair_refused(spark, tmp_path):
    """Crash injection between the pair's two appends: the next extend
    refuses loudly with the embedding family's repair advice."""
    emb = _emb(spark)
    table, tracker = _mk_index(tmp_path, "etorn")
    EX.build_embedding_dedup_index(
        emb.where("vec_id < 100"), table, tracker, dim=DIM,
        n_planes=PLANES, bands=BANDS, band_shards=8, doc_shards=4,
    )

    calls = {"n": 0}
    orig = tracker._append_commit

    def boom(tbl, update):
        if calls["n"] == 1:
            raise RuntimeError("simulated crash between pair appends")
        calls["n"] += 1
        return orig(tbl, update)

    tracker._append_commit = boom
    batch = emb.where("vec_id >= 100 AND vec_id < 110")
    with pytest.raises(RuntimeError, match="simulated crash"):
        EX.extend_embedding_dedup_index(batch, table, tracker)

    tracker2 = FileBackedVersionTracker(str(tmp_path / "_log_etorn"))
    with pytest.raises(TornPairError, match="build_embedding_dedup_index"):
        EX.extend_embedding_dedup_index(batch, table, tracker2)


def test_guards(spark, tmp_path):
    """Dim mismatches, bad banding, and append-mode re-submissions are
    rejected by name."""
    emb = _emb(spark)
    table, tracker = _mk_index(tmp_path, "eguard")
    with pytest.raises(ValueError, match="must divide"):
        EX.build_embedding_dedup_index(
            emb, table, tracker, dim=DIM, n_planes=10, bands=4
        )
    with pytest.raises(ValueError, match="does not match the embedding"):
        EX.build_embedding_dedup_index(emb, table, tracker, dim=32)
    EX.build_embedding_dedup_index(
        emb.where("vec_id < 100"), table, tracker, dim=DIM,
        n_planes=PLANES, bands=BANDS, band_shards=8, doc_shards=4,
    )
    with pytest.raises(ValueError, match="does not match the embedding"):
        EX.extend_embedding_dedup_index(
            spark.createDataFrame(
                [(900, [1.0, 2.0])], "vec_id long, embedding array<float>"
            ),
            table, tracker,
        )
    with pytest.raises(ValueError, match="mode='append'"):
        EX.extend_embedding_dedup_index(
            emb.where("vec_id IN (3, 900)"), table, tracker, mode="append"
        )


def test_pairs_table_lands_in_extend_commit(spark, tmp_path):
    """The embedding family shares the exactly-once pairs journal: an
    extend's verified pairs land as one batch partition in the extend's
    own pair commit and match the returned relation."""
    from chronicles_spark.spark.reader import read_version

    emb = _emb(spark)
    corpus = emb.where("vec_id < 200")
    table, tracker = _mk_index(tmp_path, "epairs")
    EX.build_embedding_dedup_index(
        corpus, table, tracker, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=8, doc_shards=4,
    )
    pt = DX.dedup_pairs_table(table)
    donor = corpus.where("vec_id = 11").collect()[0]["embedding"]
    batch = spark.createDataFrame(
        [(900, donor)], "vec_id long, embedding array<float>"
    )
    pairs, _, arts = EX.extend_embedding_dedup_index(
        batch, table, tracker, threshold=THRESH, pairs_table=pt
    )
    stored = read_version(
        spark, pt, tracker.current_version(pt.name),
        infer_partition_types=False,
    )
    assert sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6), r["batch"])
        for r in stored.collect()
    ) == [(*t, arts.version_label) for t in _pairs(pairs)]
    assert (11, 900, 1.0) in _pairs(pairs)


@pytest.mark.slow
def test_embedding_stream_sink_and_epoch_replay(spark, tmp_path):
    """A real embedding stream keeps the index current with one O(batch)
    extend per micro-batch; with a pairs_table the streamed pairs land
    exactly-once in the journal, a replayed epoch is skipped, and the
    journal's union equals the full re-run's pairs for streamed ids."""
    from chronicles_spark.spark.reader import read_version

    emb = _emb(spark)
    corpus = emb.where("vec_id < 250")
    table, tracker = _mk_index(tmp_path, "estream")
    EX.build_embedding_dedup_index(
        corpus, table, tracker, dim=DIM, n_planes=PLANES, bands=BANDS,
        band_shards=16, doc_shards=8,
    )
    pt = DX.dedup_pairs_table(table)

    src = str(tmp_path / "emb_src")
    emb.where("vec_id >= 250").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = EX.embedding_dedup_stream_sink(
        stream, table, tracker, "t", str(tmp_path / "eckpt"),
        threshold=THRESH, pairs_table=pt,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive
    if q.exception() is not None:
        raise q.exception()

    msgs = [
        u.metadata.message
        for u in tracker.table_state(table.name).updates
        if u.metadata.message.startswith("emb-dedup-stream epoch ")
    ]
    assert len(msgs) >= 2  # several micro-batches committed
    assert EX.verify_embedding_dedup_index(spark, table, tracker).count() == 0

    stored = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in read_version(
            spark, pt, tracker.current_version(pt.name),
            infer_partition_types=False,
        ).collect()
    )
    want = _full_pairs(emb, "id_b >= 250 OR id_a >= 250")
    assert stored == want and want

    # replay of the latest committed epoch is skipped (no new commit,
    # no pairs double-landing)
    last_epoch = max(
        int(m.split(" epoch ", 1)[1].split(" ", 1)[0]) for m in msgs
    )
    n_before = len(tracker.table_state(table.name).updates)
    EX.commit_embedding_dedup_stream_batch(
        emb.where("vec_id >= 490"), last_epoch, table, tracker, "t",
        pairs_table=pt,
    )
    assert len(tracker.table_state(table.name).updates) == n_before
    with pytest.raises(RuntimeError, match="behind the latest"):
        EX.commit_embedding_dedup_stream_batch(
            emb.where("vec_id >= 490"), last_epoch - 1, table, tracker, "t",
        )


def test_batch_vector_type_mismatch_rejected(spark, tmp_path):
    """ADVICE r9: a double-array batch against a float-built index must
    raise instead of unionByName silently widening the touched shards
    to double (mixed parquet physical types across shards)."""
    import pytest
    from pyspark.sql import functions as F

    vecs = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.sin((F.col("id") + 1) * F.lit(0.3 + 0.7 * j)).cast("float")
            for j in range(8)
        ]).alias("embedding"),
    )
    tracker = FileBackedVersionTracker(str(tmp_path / "_log_dtype"))
    table = TableDefinition(
        TableName("demo", "embdtype"), str(tmp_path / "embdtype"),
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    EX.build_embedding_dedup_index(
        vecs, table, tracker, dim=8, n_planes=8, bands=2,
        band_shards=4, doc_shards=2,
    )
    bad = spark.createDataFrame(
        [(900, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="keep column types stable"):
        EX.extend_embedding_dedup_index(bad, table, tracker)
