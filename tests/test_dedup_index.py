"""Round-8: the incremental dedup index (operators/dedup_index.py).

House-style differentials:
* build-then-extend == one full minhash_dedup re-run over the same
  corpus, pair for pair and jaccard for jaccard — across multiple
  batches and across re-submissions that CHANGE a doc's content;
* verify_dedup_index (band rows re-derived from stored shingles) empty
  after every step;
* structural O(batch) pruning pinned on the partition metadata;
* torn-pair crash injection (the pairing.py protocol, dedup flavor).
"""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import dedup as DD, dedup_index as DX
from chronicles_spark.operators.pairing import TornPairError
from chronicles_spark.sources import load_table
from chronicles_spark.trackers import FileBackedVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


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
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    )


def _full_pairs(docs, where):
    return _pairs(DD.minhash_dedup(docs, threshold=0.5).where(where))


def test_incremental_equals_full_rerun(spark, tmp_path):
    """build(corpus) + extend(B1) + extend(B2) finds, across the base
    run and the two extends, exactly the pairs one full minhash_dedup
    over corpus∪B1∪B2 finds — same endpoints, same exact jaccard."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 300")
    b1 = docs.where("doc_id >= 300 AND doc_id < 400")
    b2 = docs.where("doc_id >= 400")

    table, tracker = _mk_index(tmp_path, "inc")
    DX.build_dedup_index(corpus, table, tracker, band_shards=16, doc_shards=8)
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0

    p1, _, _ = DX.extend_dedup_index(b1, table, tracker, threshold=0.5)
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0
    p2, _, _ = DX.extend_dedup_index(b2, table, tracker, threshold=0.5)
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0

    # the base corpus' own pairs come from the one-shot operator (the
    # build indexes, it does not re-dedup the base)
    base_pairs = _full_pairs(corpus, "1=1")
    got = sorted(base_pairs + _pairs(p1) + _pairs(p2))
    want = _full_pairs(docs, "1=1")
    assert got == want and want  # fixture has known near-dups

    # each extend reported exactly the pairs its batch introduced
    assert _pairs(p1) == _full_pairs(
        docs.where("doc_id < 400"),
        "id_b >= 300",  # id_a < id_b, so any batch endpoint implies id_b in B1
    )


def test_resubmission_replaces_content(spark, tmp_path):
    """Upsert semantics: re-submitting an id with NEW text replaces its
    band rows and shingles — the incremental result equals a full re-run
    over the UPDATED corpus, and the STALE content never pairs."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 200")
    table, tracker = _mk_index(tmp_path, "resub")
    DX.build_dedup_index(corpus, table, tracker, band_shards=16, doc_shards=8)

    # re-submit doc 7 carrying doc 11's text (forms a near-exact pair
    # with 11), plus one genuinely new doc carrying doc 13's text
    donor11 = corpus.where("doc_id = 11").collect()[0]["text"]
    donor13 = corpus.where("doc_id = 13").collect()[0]["text"]
    batch = spark.createDataFrame(
        [(7, donor11), (900, donor13)], "doc_id long, text string"
    )
    pairs, _, _ = DX.extend_dedup_index(batch, table, tracker, threshold=0.5)
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0

    updated = corpus.where("doc_id <> 7").unionByName(batch)
    want = _full_pairs(updated, "id_a IN (7, 900) OR id_b IN (7, 900)")
    assert _pairs(pairs) == want
    assert (7, 11, 1.0) in _pairs(pairs)

    # the index state equals a from-scratch build over the updated corpus
    table2, tracker2 = _mk_index(tmp_path, "resub2")
    DX.build_dedup_index(updated, table2, tracker2, band_shards=16, doc_shards=8)
    from chronicles_spark.spark.reader import read_version

    def contents(t, tr):
        st = tr.current_version(t.name)
        return sorted(
            map(tuple, read_version(spark, t, st, infer_partition_types=False)
                .select("doc_id", "band_id", "band_key").collect())
        )

    assert contents(table, tracker) == contents(table2, tracker2)


def test_extend_reads_only_batch_shards(spark, tmp_path):
    """The O(batch) claim, structurally: a one-doc batch's band keys and
    doc id resolve to strict subsets of the live shard partitions —
    unrelated shards are never part of the restricted read state."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "prune")
    _, arts = DX.build_dedup_index(
        docs, table, tracker, band_shards=32, doc_shards=16
    )
    state = tracker.current_version(table.name)
    docs_state = tracker.current_version(DX.dedup_docs_table(table).name)
    live_band_shards = {
        dict(p.column_values)["band_shard"]
        for p in state.partition_versions
    }
    assert len(live_band_shards) > 8  # fixture discriminates

    one = docs.where("doc_id = 3")
    banded = DD.lsh_banded(
        one.select("doc_id", DD.shingles_of(F.col("text")).alias("shingles")),
        "doc_id", arts.bands, arts.rows,
    ).withColumn("band_shard", DX._band_shard_col(arts.band_shards))
    batch_shards = {
        r["band_shard"] for r in banded.select("band_shard").distinct().collect()
    }
    assert 0 < len(batch_shards) <= arts.bands
    sub = DX._restrict_to_values(state, DX.BAND_SHARD_COL, sorted(batch_shards))
    pruned = {
        dict(p.column_values)["band_shard"] for p in sub.partition_versions
    }
    assert pruned <= batch_shards and len(pruned) < len(live_band_shards)

    dsub = DX._restrict_to_values(
        docs_state, DX.DOC_SHARD_COL,
        [r["s"] for r in one.select(
            DX._doc_shard_col("doc_id", arts.doc_shards).alias("s")
        ).collect()],
    )
    assert len(dsub.partition_versions) <= 1


def test_candidate_band_read_pushes_band_keys(spark, tmp_path):
    """Round-9 (r8 `weak` fix): the candidate read over a touched band
    shard pushes the batch's (band_id, band_key) IN-list to the parquet
    scan — band files are written sorted by (band_id, band_key), so the
    pushed filter prunes at row-group level instead of scanning the
    shard in full.  Pinned structurally: PushedFilters carries band_key,
    and the filtered read returns exactly the full read's rows for the
    batch's keys (pure pruning, no semantic restriction)."""
    from chronicles_spark.spark.reader import read_version

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "push")
    _, arts = DX.build_dedup_index(
        docs, table, tracker, band_shards=8, doc_shards=4
    )
    state = tracker.current_version(table.name)

    banded = DD.lsh_banded(
        docs.where("doc_id = 3").select(
            "doc_id", DD.shingles_of(F.col("text")).alias("shingles")
        ),
        "doc_id", arts.bands, arts.rows,
    ).withColumn("band_shard", DX._band_shard_col(arts.band_shards))
    sample = banded.select("band_shard", "band_id", "band_key").collect()
    assert sample
    flt = DX._band_key_filter(sample)
    bsub = DX._restrict_to_values(
        state, DX.BAND_SHARD_COL, sorted({r["band_shard"] for r in sample})
    )
    full = read_version(spark, table, bsub, infer_partition_types=False)
    filtered = full.where(flt)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    pushed_lines = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("band_key" in ln for ln in pushed_lines), plan

    keys = {(r["band_id"], r["band_key"]) for r in sample}
    want = sorted(
        map(tuple, full.collect()),
        key=str,
    )
    want = [t for t in want if (t[1], t[2]) in keys]
    got = sorted(map(tuple, filtered.collect()), key=str)
    assert got == want and got  # doc 3's own band rows at minimum


def test_append_mode_rejects_existing_id(spark, tmp_path):
    """mode='append' promises every id is new — a re-submitted id must
    raise (ADVICE r8: a silent hit would duplicate id rows in both
    tables, invisible to verify_dedup_index)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "appmode")
    DX.build_dedup_index(
        docs.where("doc_id < 50"), table, tracker, band_shards=8, doc_shards=4
    )
    with pytest.raises(ValueError, match="mode='append'"):
        DX.extend_dedup_index(
            docs.where("doc_id IN (3, 60)"), table, tracker, mode="append"
        )
    # genuinely-new ids pass in append mode
    pairs, _, _ = DX.extend_dedup_index(
        docs.where("doc_id >= 60 AND doc_id < 70"), table, tracker,
        mode="append",
    )
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0


def test_torn_pair_refused_and_rebuild_repairs(spark, tmp_path):
    """Crash injection between the pair's two appends (bands commit
    lands, docs' doesn't): the next extend refuses loudly; a fresh
    build_dedup_index over the full corpus re-establishes the pair."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 100")
    table, tracker = _mk_index(tmp_path, "torn")
    DX.build_dedup_index(corpus, table, tracker, band_shards=8, doc_shards=4)

    calls = {"n": 0}
    orig = tracker._append_commit

    def boom(tbl, update):
        if calls["n"] == 1:
            raise RuntimeError("simulated crash between pair appends")
        calls["n"] += 1
        return orig(tbl, update)

    tracker._append_commit = boom
    batch = docs.where("doc_id >= 100 AND doc_id < 110")
    with pytest.raises(RuntimeError, match="simulated crash"):
        DX.extend_dedup_index(batch, table, tracker)

    tracker2 = FileBackedVersionTracker(str(tmp_path / "_log_torn"))
    with pytest.raises(TornPairError, match="build_dedup_index"):
        DX.extend_dedup_index(batch, table, tracker2)

    # repair: full rebuild over the corpus the caller knows is right
    DX.build_dedup_index(
        docs.where("doc_id < 110"), table, tracker2,
        band_shards=8, doc_shards=4,
    )
    assert DX.verify_dedup_index(spark, table, tracker2).count() == 0
    pairs, _, _ = DX.extend_dedup_index(
        docs.where("doc_id >= 110 AND doc_id < 120"), table, tracker2
    )
    assert DX.verify_dedup_index(spark, table, tracker2).count() == 0


def test_batch_validation_and_empty_shingles(spark, tmp_path):
    """Null ids, duplicate ids and empty batches are rejected by name;
    empty-shingle (short) docs index cleanly — doc rows stored, no band
    rows, never a constant-key bucket pairing every short doc."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "valid")
    DX.build_dedup_index(
        docs.where("doc_id < 50"), table, tracker, band_shards=8, doc_shards=4
    )

    with pytest.raises(ValueError, match="NULL doc_id"):
        DX.extend_dedup_index(
            spark.createDataFrame(
                [(None, "some text here")], "doc_id long, text string"
            ),
            table, tracker,
        )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        DX.extend_dedup_index(
            spark.createDataFrame(
                [(901, "a"), (901, "b")], "doc_id long, text string"
            ),
            table, tracker,
        )
    with pytest.raises(ValueError, match="empty batch"):
        DX.extend_dedup_index(
            spark.createDataFrame([], "doc_id long, text string"),
            table, tracker,
        )

    # two short docs (no 3-gram shingles): stored, unbanded, unpaired
    pairs, _, _ = DX.extend_dedup_index(
        spark.createDataFrame(
            [(902, "too short"), (903, "too short")],
            "doc_id long, text string",
        ),
        table, tracker,
    )
    assert pairs.count() == 0
    from chronicles_spark.spark.reader import read_version

    dt = DX.dedup_docs_table(table)
    stored = read_version(
        spark, dt, tracker.current_version(dt.name), infer_partition_types=False
    ).where("doc_id IN (902, 903)")
    assert stored.count() == 2
    bands = read_version(
        spark, table, tracker.current_version(table.name),
        infer_partition_types=False,
    ).where("doc_id IN (902, 903)")
    assert bands.count() == 0
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0


def test_dedup_stream_sink_and_epoch_replay(spark, tmp_path):
    """A real document stream (file source, several micro-batches) keeps
    the dedup index current and surfaces each batch's verified pairs via
    on_pairs; after the drain the union of streamed pairs equals the
    full re-run's pairs for the streamed docs, and a replayed epoch is
    skipped without touching the index."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 250")
    table, tracker = _mk_index(tmp_path, "stream")
    DX.build_dedup_index(corpus, table, tracker, band_shards=16, doc_shards=8)

    src = str(tmp_path / "docs_src")
    docs.where("doc_id >= 250").repartition(3).write.parquet(src)
    got_pairs = []
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = DX.dedup_stream_sink(
        stream, table, tracker, "t", str(tmp_path / "ckpt"),
        threshold=0.5,
        on_pairs=lambda p, e: got_pairs.extend(_pairs(p)),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive
    if q.exception() is not None:
        raise q.exception()

    msgs = [
        u.metadata.message
        for u in tracker.table_state(table.name).updates
        if u.metadata.message.startswith("dedup-stream epoch ")
    ]
    assert len(msgs) >= 2  # several micro-batches committed
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0

    # streamed pairs ⊇-check: every full-run pair with a streamed
    # endpoint was reported exactly once (batch boundaries differ from
    # the one-shot run, but the UNION must match pairs touching ≥1
    # streamed doc)
    want = _full_pairs(docs, "id_b >= 250 OR id_a >= 250")
    assert sorted(got_pairs) == want

    # replay of the latest committed epoch is skipped (no new commit)
    last_epoch = max(
        int(m.split(" epoch ", 1)[1].split(" ", 1)[0]) for m in msgs
    )
    n_before = len(tracker.table_state(table.name).updates)
    DX.commit_dedup_stream_batch(
        docs.where("doc_id >= 490"), last_epoch, table, tracker, "t",
    )
    assert len(tracker.table_state(table.name).updates) == n_before
    # an epoch BEHIND the latest raises (wiped checkpoint)
    with pytest.raises(RuntimeError, match="behind the latest"):
        DX.commit_dedup_stream_batch(
            docs.where("doc_id >= 490"), last_epoch - 1, table, tracker, "t",
        )
