"""Round-9: the incremental SIMHASH dedup index
(operators/simhash_index.py) — the third family instance, and the
existence proof that a new similarity family costs only its
encoder/bander/verifier on the shared core.

Differentials mirror the other families': build+extend == the one-shot
simhash_near_dup_candidates (no skew cap) restricted to batch-endpoint
pairs; verify empty after every step; re-submission replaces content;
re-geometry rebuild equals a from-scratch build.
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
    simhash_index as SX,
)
from chronicles_spark.sources import load_table
from chronicles_spark.trackers import FileBackedVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

BITS, BANDS, MAX_HAM = 32, 4, 3


def _mk_index(tmp_path, name):
    tracker = FileBackedVersionTracker(str(tmp_path / f"_log_{name}"))
    table = TableDefinition(
        TableName("demo", name), str(tmp_path / name),
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    return table, tracker


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["hamming"]) for r in df.collect())


def _full_pairs(docs, where):
    return _pairs(
        DD.simhash_near_dup_candidates(
            docs, bits=BITS, bands=BANDS, max_band_freq=None
        )
        .where(F.col("hamming") <= MAX_HAM)
        .where(where)
    )


def test_incremental_equals_full_rerun(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 300")
    b1 = docs.where("doc_id >= 300 AND doc_id < 400")
    b2 = docs.where("doc_id >= 400")

    table, tracker = _mk_index(tmp_path, "sinc")
    SX.build_simhash_dedup_index(
        corpus, table, tracker, bits=BITS, bands=BANDS,
        band_shards=16, doc_shards=8,
    )
    assert SX.verify_simhash_dedup_index(spark, table, tracker).count() == 0

    p1, _, _ = SX.extend_simhash_dedup_index(
        b1, table, tracker, max_hamming=MAX_HAM
    )
    assert SX.verify_simhash_dedup_index(spark, table, tracker).count() == 0
    p2, _, _ = SX.extend_simhash_dedup_index(
        b2, table, tracker, max_hamming=MAX_HAM
    )
    assert SX.verify_simhash_dedup_index(spark, table, tracker).count() == 0

    base_pairs = _full_pairs(corpus, "1=1")
    got = sorted(base_pairs + _pairs(p1) + _pairs(p2))
    want = _full_pairs(docs, "1=1")
    assert got == want and want  # fixture has known near-dups
    assert _pairs(p1) == _full_pairs(docs.where("doc_id < 400"), "id_b >= 300")


def test_resubmission_and_rebuild(spark, tmp_path):
    """Upsert replaces a re-submitted id's fingerprint (the stale one
    never pairs); rebuild re-geometries in place and equals a
    from-scratch build — both inherited from the shared core."""
    from chronicles_spark.spark.reader import read_version

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where("doc_id < 200")
    table, tracker = _mk_index(tmp_path, "sresub")
    SX.build_simhash_dedup_index(
        corpus, table, tracker, bits=BITS, bands=BANDS,
        band_shards=8, doc_shards=4,
    )

    donor11 = corpus.where("doc_id = 11").collect()[0]["text"]
    batch = spark.createDataFrame(
        [(7, donor11)], "doc_id long, text string"
    )
    pairs, _, _ = SX.extend_simhash_dedup_index(
        batch, table, tracker, max_hamming=MAX_HAM
    )
    assert SX.verify_simhash_dedup_index(spark, table, tracker).count() == 0
    updated = corpus.where("doc_id <> 7").unionByName(batch)
    assert _pairs(pairs) == _full_pairs(updated, "id_a = 7 OR id_b = 7")
    assert (7, 11, 0) in _pairs(pairs)  # identical text → hamming 0

    # re-geometry: more shards + different banding, one store pass
    _, arts = SX.rebuild_simhash_dedup_index(
        spark, table, tracker, bands=8, band_shards=16, doc_shards=8
    )
    assert (arts.bits, arts.bands) == (BITS, 8)
    assert SX.verify_simhash_dedup_index(spark, table, tracker).count() == 0

    table2, tracker2 = _mk_index(tmp_path, "sresub2")
    SX.build_simhash_dedup_index(
        updated, table2, tracker2, bits=BITS, bands=8,
        band_shards=16, doc_shards=8,
    )

    def contents(t, tr):
        st = tr.current_version(t.name)
        return sorted(
            map(tuple, read_version(spark, t, st, infer_partition_types=False)
                .select("doc_id", "band_id", "band_key", "band_shard")
                .collect())
        )

    assert contents(table, tracker) == contents(table2, tracker2)

    # guards shared with the other families
    with pytest.raises(ValueError, match="must divide"):
        SX.build_simhash_dedup_index(docs, *_mk_index(tmp_path, "sbad"),
                                     bits=32, bands=5)
    with pytest.raises(ValueError, match="mode='append'"):
        SX.extend_simhash_dedup_index(
            docs.where("doc_id IN (3, 900)"), table, tracker, mode="append"
        )


def test_bits_over_32_rejected(spark, tmp_path):
    """ADVICE r9: simhash_expr derives one vote per md5 hex digit (32);
    bits beyond that would be constant '0' and persist as degenerate
    band geometry — refused at build/validate time."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "bits64")
    with pytest.raises(ValueError, match="32 votes"):
        SX.build_simhash_dedup_index(
            docs.where("doc_id < 20"), table, tracker, bits=64, bands=4
        )


def test_torn_pair_refused_at_family_level(spark, tmp_path):
    """Round-10 directive #3: the crash-between-appends exposure and its
    loud refusal, exercised through the SIMHASH family's own wrappers
    (the shared-core tests cover the mechanics; this pins the family
    wiring and its repair advice)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    table, tracker = _mk_index(tmp_path, "torn")
    SX.build_simhash_dedup_index(
        docs.where("doc_id < 60"), table, tracker,
        bits=BITS, bands=BANDS, band_shards=4, doc_shards=2,
    )

    orig = tracker._append_commit
    calls = {"n": 0}

    def boom(tbl, update):
        calls["n"] += 1
        if calls["n"] == 2:  # band line lands, docs line dies
            raise RuntimeError("simulated crash")
        return orig(tbl, update)

    tracker._append_commit = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        SX.extend_simhash_dedup_index(
            docs.where("doc_id >= 60 AND doc_id < 70"), table, tracker
        )
    tracker._append_commit = orig

    tracker2 = FileBackedVersionTracker(str(tmp_path / "_log_torn"))
    from chronicles_spark.operators.pairing import TornPairError

    with pytest.raises(TornPairError, match="build_simhash_dedup_index"):
        SX.extend_simhash_dedup_index(
            docs.where("doc_id >= 70 AND doc_id < 80"), table, tracker2
        )
