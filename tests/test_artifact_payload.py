"""Content-addressed parquet payloads for quantizer-scale geometry
(operators/artifact_payload.py) — the "right fix" half of the sidecar
size bound: bulk centroid/codebook fields externalize to ONE parquet
file referenced by hash from the JSON sidecar; re-stamps under new
labels reuse the same payload; loads resolve transparently; the sweep
reclaims unreferenced payloads under the orphan age guard.  House
style: end-to-end through the real families with the threshold
monkeypatched low, plus unit round-trips."""

import json

import pytest

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import artifact_payload as AP
from chronicles_spark.trackers.fs import LocalFileSystem, MemoryFileSystem

CENTS = [[0, [0.5, -1.25, 3.0]], [7, [1.0, 2.0, 3.5]]]
BOOKS = [[[0.1, 0.2], [0.3, 0.4]], [[1.5, 2.5], [3.5, 4.5]]]


def test_encode_decode_roundtrip():
    fields = {"centroids": CENTS, "codebooks": BOOKS}
    assert AP._decode_payload(AP._encode_payload(fields)) == fields
    assert AP._decode_payload(AP._encode_payload({"centroids": CENTS})) == {
        "centroids": CENTS
    }


def test_under_threshold_doc_passes_through_identically(tmp_path):
    fs = LocalFileSystem()
    doc = {"version_label": "v1", "centroids": CENTS, "band_shards": 4}
    out = AP.externalize_doc(fs, str(tmp_path), doc)
    assert out is doc  # identity: pre-payload sidecars stay byte-identical
    assert AP.resolve_doc(fs, str(tmp_path), doc) is doc


@pytest.mark.parametrize("fs_factory", [
    lambda tmp: (LocalFileSystem(), str(tmp)),
    lambda tmp: (MemoryFileSystem("payload-test"), "root"),
])
def test_externalize_resolve_roundtrip(tmp_path, monkeypatch, fs_factory):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 10)
    fs, root = fs_factory(tmp_path)
    fs.mkdirs(root)
    doc = {
        "version_label": "v1", "centroids": CENTS, "codebooks": BOOKS,
        "n_clusters": 2,
    }
    slim = AP.externalize_doc(fs, root, dict(doc))
    assert "centroids" not in slim and "codebooks" not in slim
    assert slim["payload_fields"] == ["centroids", "codebooks"]
    assert slim["n_clusters"] == 2
    name = AP._payload_name(slim["payload_ref"])
    assert name in fs.list_dir(root)
    back = AP.resolve_doc(fs, root, slim)
    assert back == doc
    # content-addressing: a re-stamp under a new label reuses the file
    doc2 = dict(doc, version_label="v2")
    slim2 = AP.externalize_doc(fs, root, doc2)
    assert slim2["payload_ref"] == slim["payload_ref"]
    assert sum(
        1 for n in fs.list_dir(root) if n.startswith(AP.PAYLOAD_PREFIX)
    ) == 1


def test_missing_payload_file_is_loud(tmp_path, monkeypatch):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 10)
    AP._CACHE.clear()
    fs, root = LocalFileSystem(), str(tmp_path)
    slim = AP.externalize_doc(fs, root, {"version_label": "v", "centroids": CENTS})
    fs.remove_file(fs.join(root, AP._payload_name(slim["payload_ref"])))
    with pytest.raises(ValueError, match="missing"):
        AP.resolve_doc(fs, root, slim)


def test_payload_max_bytes_refused(tmp_path, monkeypatch):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 10)
    monkeypatch.setattr(AP, "PAYLOAD_MAX_BYTES", 100)
    with pytest.raises(ValueError, match="payload bound"):
        AP.externalize_doc(
            LocalFileSystem(), str(tmp_path),
            {"version_label": "v", "centroids": CENTS},
        )


def test_no_bytes_backend_degrades_to_inline(tmp_path, monkeypatch):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 10)

    class NoBytes(LocalFileSystem):
        def supports_bytes(self):
            return False

    doc = {"version_label": "v", "centroids": CENTS}
    out = AP.externalize_doc(NoBytes(), str(tmp_path), doc)
    assert out is doc  # inline degrade, bounded by the JSON limit


def test_fs_bytes_roundtrip(tmp_path):
    lfs = LocalFileSystem()
    p = str(tmp_path / "blob.bin")
    lfs.write_bytes(p, b"\x00\x01parquet\xff")
    assert lfs.read_bytes(p) == b"\x00\x01parquet\xff"
    mfs = MemoryFileSystem("bytes-rt")
    mfs.write_bytes("root/b.bin", b"\x00\xff")
    assert mfs.read_bytes("root/b.bin") == b"\x00\xff"
    with pytest.raises(ValueError, match="binary"):
        mfs.read_text("root/b.bin")


# ---------------------------------------------------------------------------
# end-to-end through the real families (threshold monkeypatched low so
# toy quantizers externalize)


def _sem_table(tmp_path, name):
    from chronicles_spark.trackers import FileBackedVersionTracker

    tracker = FileBackedVersionTracker(str(tmp_path / f"_log_{name}"))
    table = TableDefinition(
        TableName("demo", name), str(tmp_path / name),
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    return table, tracker


def test_semantic_family_end_to_end_with_external_payload(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 100)
    AP._CACHE.clear()
    import chronicles_spark.operators.semantic_dedup_index as SDX

    dim = 4
    cents = [(i, [1.0 * (i == j) for j in range(dim)]) for i in range(3)]
    vecs = [
        (i, [1.0 * (i % 3 == j) + 0.01 * i for j in range(dim)])
        for i in range(12)
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    table, tracker = _sem_table(tmp_path, "sempay")
    _, arts = SDX.build_semantic_dedup_index(
        df, table, tracker, dim=dim, n_clusters=3, centroids=cents,
        band_shards=2, doc_shards=2,
    )
    # the sidecar on disk is slim and references the payload
    from chronicles_spark.operators.dedup_index import _artifact_path

    fs, apath = _artifact_path(table, arts.version_label)
    side = json.loads(fs.read_text(apath))
    assert "payload_ref" in side and "centroids" not in side
    # loader resolves transparently and agrees with the build's stamp
    state = tracker.current_version(table.name)
    loaded = SDX.load_semantic_dedup_artifacts(table, state)
    assert loaded.centroid_list() == [(i, list(v)) for i, v in cents]
    # extend re-stamps the same geometry: ONE payload file, two sidecars
    batch = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    pairs, _, _ = SDX.extend_semantic_dedup_index(
        batch, table, tracker, threshold=0.5
    )
    pairs.count()
    from chronicles_spark.trackers.fs import filesystem_for

    pfs, root = filesystem_for(table.location)
    names = pfs.list_dir(root)
    assert sum(1 for n in names if n.startswith(AP.PAYLOAD_PREFIX)) == 1
    assert sum(1 for n in names if n.startswith("_dedup_artifacts_")) == 2
    # verify audit still passes end-to-end through resolved artifacts
    assert SDX.verify_semantic_dedup_index(spark, table, tracker).count() == 0


def test_payload_sweep_keeps_referenced_dooms_orphan(
    spark, tmp_path, monkeypatch
):
    from datetime import timedelta

    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 100)
    AP._CACHE.clear()
    import chronicles_spark.operators.semantic_dedup_index as SDX
    from chronicles_spark.operators.dedup_index import vacuum_dedup_artifacts
    from chronicles_spark.trackers.fs import filesystem_for

    dim = 4
    cents = [(i, [1.0 * (i == j) for j in range(dim)]) for i in range(3)]
    df = spark.createDataFrame(
        [(i, [1.0 * (i % 3 == j) for j in range(dim)]) for i in range(9)],
        "vec_id long, embedding array<double>",
    )
    table, tracker = _sem_table(tmp_path, "sweep")
    SDX.build_semantic_dedup_index(
        df, table, tracker, dim=dim, n_clusters=3, centroids=cents,
        band_shards=2, doc_shards=2,
    )
    fs, root = filesystem_for(table.location)
    # referenced payload survives even at negative age
    assert vacuum_dedup_artifacts(
        table, tracker, orphan_min_age=timedelta(seconds=-1)
    ) == []
    assert any(n.startswith(AP.PAYLOAD_PREFIX) for n in fs.list_dir(root))
    # an unreferenced orphan payload (crashed build) ages out
    orphan = fs.join(root, AP._payload_name("deadbeef" * 4))
    fs.write_bytes(orphan, AP._encode_payload({"centroids": CENTS}))
    assert vacuum_dedup_artifacts(
        table, tracker, dry_run=True, orphan_min_age=timedelta(days=7)
    ) == []  # too young
    assert vacuum_dedup_artifacts(
        table, tracker, orphan_min_age=timedelta(seconds=-1)
    ) == [orphan]
    assert not fs.exists(orphan)


def test_ann_family_end_to_end_with_external_payload(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setattr(AP, "PAYLOAD_INLINE_MAX", 100)
    AP._CACHE.clear()
    from chronicles_spark.operators import ann_index as AX
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.trackers.fs import filesystem_for

    tracker = FileBackedVersionTracker(str(tmp_path / "_log"))
    table = TableDefinition(
        TableName("demo", "annpay"), str(tmp_path / "annpay"),
        PartitionSchema(("bucket",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    df = spark.createDataFrame(
        [(i, [float(i % 4 == j) + 0.01 * i for j in range(4)]) for i in range(32)],
        "vec_id long, embedding array<double>",
    )
    AX.build_ann_index(
        df, table, tracker, n_clusters=4, m=2, k_sub=4, iters=2,
        id_map_shards=4,
    )
    fs, root = filesystem_for(table.location)
    side = json.loads(
        fs.read_text(
            fs.join(root, [n for n in fs.list_dir(root)
                           if n.startswith("_ann_artifacts_")][0])
        )
    )
    assert "payload_ref" in side and "centroids" not in side
    arts = AX.load_ann_artifacts(table, tracker.current_version(table.name))
    assert len(arts.centroids) == 4 and len(arts.codebooks) == 2
    # search + extend run end-to-end through the resolved quantizer
    q = df.limit(2).selectExpr("vec_id as query_id", "embedding as qv")
    hits = AX.ivfpq_topk_indexed(
        spark, table, tracker, q, k=3, n_probe=2
    ).collect()
    assert hits
    AX.extend_ann_index(df.where("vec_id < 4"), table, tracker)
    names = fs.list_dir(root)
    assert sum(1 for n in names if n.startswith(AP.PAYLOAD_PREFIX)) == 1
    assert sum(1 for n in names if n.startswith("_ann_artifacts_")) >= 2
