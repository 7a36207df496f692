"""Env-gated REAL-object-store CAS smoke test (round-6 directive #8).

The CAS commit protocol's conditional-put semantics are raced exhaustively
over local/memory backends and a fake-412 fsspec double in
tests/test_cas_commits.py — but the claim that a REAL S3/GCS deployment
honours them can only be checked against a real bucket, which this
container cannot reach (no network, no fsspec).  Following the
reference's Glue integration-test pattern (aws-glue/src/it/.../
GlueMetastoreIntegrationSpec.scala:26-79: skip unless the env opts in),
this suite runs only when BOTH are present:

    CHRONICLES_OBJECT_STORE_URL=s3://bucket/prefix   (or gs://...)
    fsspec + the scheme's driver (s3fs / gcsfs) importable

and the store supports conditional puts (S3 `If-None-Match`, GCS
generation preconditions).  Everything it exercises is the production
CAS path: conditional-put probe, full tracker round-trip (init → commits
→ checkpoint cut → reload-from-cold agreement → time travel), loser-put
semantics.  Cleanup removes only what the test created.
"""

import os
import uuid

import pytest

from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version

OBJECT_STORE_URL = os.environ.get("CHRONICLES_OBJECT_STORE_URL")

pytestmark = pytest.mark.skipif(
    not OBJECT_STORE_URL,
    reason="set CHRONICLES_OBJECT_STORE_URL=s3://bucket/prefix (and install "
    "fsspec + the scheme driver) to run the real-object-store CAS smoke",
)


@pytest.fixture(scope="module")
def moto_endpoint():
    """With CHRONICLES_SMOKE_MOTO=1, spin a REAL S3-API server (moto) on
    localhost for the duration of the module and create the URL's bucket
    — the S3 wire protocol incl. `If-None-Match` conditional puts, no
    network needed.  Without the flag, assume the URL points at a real
    deployment (MinIO / S3 / GCS) that is already reachable."""
    if os.environ.get("CHRONICLES_SMOKE_MOTO") != "1":
        yield None
        return
    import socket
    import subprocess
    import time

    boto3 = pytest.importorskip("boto3")
    pytest.importorskip("moto")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    endpoint = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        ["moto_server", "-p", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        os.environ.setdefault("AWS_ACCESS_KEY_ID", "smoke")
        os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "smoke")
        os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
        os.environ["CHRONICLES_S3_ENDPOINT"] = endpoint
        client = boto3.client("s3", endpoint_url=endpoint)
        bucket = OBJECT_STORE_URL[len("s3://"):].split("/", 1)[0]
        for _ in range(40):  # wait for the server to come up
            try:
                client.create_bucket(Bucket=bucket)
                break
            except Exception:
                time.sleep(0.25)
        else:
            raise RuntimeError("moto_server did not come up")
        yield endpoint
    finally:
        proc.terminate()
        proc.wait(timeout=10)
        os.environ.pop("CHRONICLES_S3_ENDPOINT", None)


@pytest.fixture()
def store(moto_endpoint):
    scheme = OBJECT_STORE_URL.split("://", 1)[0]
    try:
        import fsspec

        from chronicles_spark.trackers.fs import FsspecFileSystem

        fs = FsspecFileSystem(fsspec.filesystem(scheme), conditional_put=True)
    except ImportError:
        if scheme != "s3":
            pytest.skip(f"scheme {scheme!r} needs fsspec")
        pytest.importorskip("boto3")
        from chronicles_spark.trackers.fs import BotoS3FileSystem

        fs = BotoS3FileSystem()  # endpoint/creds from the environment
    base = OBJECT_STORE_URL.rstrip("/") + f"/chronicles_cas_smoke_{uuid.uuid4().hex}"
    yield fs, base
    fs.remove_tree(base)


def test_conditional_put_is_exclusive(store):
    fs, base = store
    p = fs.join(base, "probe.json")
    assert fs.write_text_if_absent(p, "winner") is True
    assert fs.write_text_if_absent(p, "loser") is False
    assert fs.read_text(p) == "winner"  # loser never overwrote


def test_cas_tracker_roundtrip_on_object_store(store):
    from chronicles_spark.trackers import FileBackedVersionTracker

    fs, base = store
    root = base + "/_log"
    tracker = FileBackedVersionTracker(
        root, fs=fs, use_cas=True, checkpoint_interval=2
    )
    t = TableName("smoke", "cas")
    tracker.init_table(t, is_snapshot=False, user_id="smoke")
    commits = []
    for i in range(5):
        u = TableUpdate(
            TableUpdateMetadata.new("smoke", f"c{i}"),
            (AddPartitionVersion(
                Partition.parse(f"d=2024-01-0{i + 1}"), generate_version()
            ),),
        )
        tracker.commit(t, u)
        commits.append(u.metadata.commit_id)

    # checkpoint artifacts were cut on the real store
    tdir = tracker._table_dir(t)
    assert any(n.startswith("checkpoint_") for n in fs.list_dir(tdir))

    # a COLD second instance agrees with the writer, with and without
    # the checkpoint fast path, including time travel
    warm = tracker.current_version(t)
    cold = FileBackedVersionTracker(root, fs=fs, use_cas=True)
    truth = FileBackedVersionTracker(root, fs=fs, checkpoint_interval=None)
    assert cold.current_version(t) == warm == truth.current_version(t)
    assert cold.version_at(t, commits[1]) == truth.version_at(t, commits[1])
    assert len(warm.partition_versions) == 5


def test_head_resolution_and_pair_markers_on_object_store(store):
    """Round-11: the O(tail) base resolution on a REAL S3 wire protocol —
    pair-marked CAS commits, checkpoint carrying the marker field,
    head_resolution agreeing with the full-walk triple."""
    from chronicles_spark.core import fold
    from chronicles_spark.core.markers import pair_label
    from chronicles_spark.operators.pairing import pair_message, pinned_state
    from chronicles_spark.trackers import FileBackedVersionTracker

    fs, base = store
    root = base + "/_log_hr"
    tracker = FileBackedVersionTracker(
        root, fs=fs, use_cas=True, checkpoint_interval=3
    )
    t = TableName("smoke", "hr")
    tracker.init_table(t, is_snapshot=False, user_id="smoke")
    for i in range(9):
        v = generate_version()
        msg = pair_message(f"e{i}", v.label) if i % 2 == 0 else f"n{i}"
        tracker.commit(
            t,
            TableUpdate(
                TableUpdateMetadata.new("smoke", msg),
                (AddPartitionVersion(Partition.parse(f"d=2024-02-0{i % 9 + 1}"), v),),
            ),
        )
    out = tracker.head_resolution(t)
    assert out is not None  # the fast path answers on the object store
    truth = FileBackedVersionTracker(root, fs=fs, checkpoint_interval=None)
    st = truth.table_state(t)
    prefix = list(fold.take_through(st.updates, st.current_version))
    marker = next(
        (
            pl
            for u in reversed(prefix)
            if (pl := pair_label(u.metadata.message)) is not None
        ),
        None,
    )
    assert out == (
        fold.current_version(st.updates, st.current_version),
        st.current_version,
        marker,
    )
    assert pinned_state(tracker, t) == out


def test_payload_bytes_roundtrip_on_object_store(store):
    """Round-11: the artifact-payload binary surface over the S3 wire
    protocol — externalize → resolve round-trip through real puts/gets."""
    from chronicles_spark.operators import artifact_payload as AP

    fs, base = store
    if not fs.supports_bytes():
        pytest.skip("backend has no binary surface")
    root = base + "/payloads"
    doc = {
        "version_label": "v1",
        "centroids": [[i, [0.5 * i, -1.0, float(i)]] for i in range(20)],
    }
    import json as _json

    old = AP.PAYLOAD_INLINE_MAX
    AP.PAYLOAD_INLINE_MAX = 10
    try:
        AP._CACHE.clear()
        slim = AP.externalize_doc(fs, root, dict(doc))
        assert "payload_ref" in slim and "centroids" not in slim
        AP._CACHE.clear()  # force the real S3 read back
        assert AP.resolve_doc(fs, root, slim) == doc
    finally:
        AP.PAYLOAD_INLINE_MAX = old


def test_commit_log_archival_on_object_store(store):
    """Round-12: archival on a REAL S3 wire protocol — conditional-put
    archive artifact, token-CAS floor advance, post-claim floor re-check,
    deletes, and a cold reader folding through the archive identically to
    the full-walk ground truth."""
    from chronicles_spark.trackers import FileBackedVersionTracker

    fs, base = store
    root = base + "/_log_arch"
    tracker = FileBackedVersionTracker(
        root, fs=fs, use_cas=True, checkpoint_interval=2
    )
    t = TableName("smoke", "arch")
    tracker.init_table(t, is_snapshot=False, user_id="smoke")
    commits = []
    for i in range(8):
        u = TableUpdate(
            TableUpdateMetadata.new("smoke", f"c{i}"),
            (AddPartitionVersion(
                Partition.parse(f"d=2024-02-0{i + 1}"), generate_version()
            ),),
        )
        tracker.commit(t, u)
        commits.append(u.metadata.commit_id)
    want = tracker.current_version(t)

    out = tracker.archive_commits(t, retain_checkpoints=1,
                                  max_chunk_bytes=4096)
    assert out["archived"] > 0 and out["archive"] is not None
    # round 13: chunk names on the wire carry (first-last, n, crc)
    import re as _re

    assert all(
        _re.match(r"^archive_\d{13}-\d{13}_\d{8}_[0-9a-f]{8}\.json$", a)
        for a in out["archives"]
    )
    tdir = tracker._table_dir(t)
    names = fs.list_dir(tdir)
    assert any(n.startswith("archive_") for n in names)
    floor = tracker._read_floor_seq(tdir)
    live = [n for n in names if n.startswith("table_update_")]
    assert live and all(
        int(n.split("_")[2].split(".")[0]) > floor for n in live
    )

    # cold readers agree, fast path and ground truth, incl. deep travel
    cold = FileBackedVersionTracker(root, fs=fs, use_cas=True)
    truth = FileBackedVersionTracker(root, fs=fs, checkpoint_interval=None)
    assert cold.current_version(t) == want == truth.current_version(t)
    assert cold.version_at(t, commits[1]) == truth.version_at(t, commits[1])

    # a post-archival CAS commit claims above the floor (post-claim
    # re-check exercised on the wire) and stays readable
    u = TableUpdate(
        TableUpdateMetadata.new("smoke", "after-archive"),
        (AddPartitionVersion(Partition.parse("d=2024-02-28"), generate_version()),),
    )
    cold.commit(t, u)
    assert len(truth.current_version(t).partition_versions) == 9

    # round 14: the apply run above CYCLED the archival lease on the wire
    # (conditional-create claim + owner-token release).  Released state is
    # absent or token-CAS tombstoned to ts=0 — either way a fresh archiver
    # claims immediately, and its own release frees it again.
    import json as _json

    lease = fs.join(tdir, "_archive_lease")
    try:
        assert float(_json.loads(fs.read_text(lease))["ts"]) == 0.0
    except FileNotFoundError:
        pass
    assert cold._acquire_archival_lease(tdir, ttl_seconds=3600.0)
    assert not truth._acquire_archival_lease(tdir, ttl_seconds=3600.0)
    cold._release_archival_lease(tdir)
    assert truth._acquire_archival_lease(tdir, ttl_seconds=3600.0)
    truth._release_archival_lease(tdir)
