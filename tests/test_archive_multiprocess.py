"""Commit-log archival raced by REAL OS-process writers (round 12; the
in-process suite is tests/test_commit_archive.py — separate processes
share no clocks, caches, or locks, so only this shape exercises the
floor protocol's cross-process guarantees: floor-before-delete ordering,
writers' post-claim re-check, and the repair step under churn).

Invariant pinned for both modes: NO COMMITTED UPDATE IS EVER LOST and no
sequence slot ever holds two different commits — while the parent
archives the log repeatedly mid-race."""

import pytest
import os
import subprocess
import sys
import time

from chronicles_spark.core.model import TableName
from chronicles_spark.trackers import FileBackedVersionTracker

# slow tier: real OS-process archival races (run via -m "slow or not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T = TableName("db", "archrace")
N_PER_PROC = 25

_WORKER = """
import sys
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion, TableUpdate, TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import FileBackedVersionTracker

mode, path, wid, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
kw = {"use_cas": True} if mode == "cas" else {"use_lock": True}
tracker = FileBackedVersionTracker(path, checkpoint_interval=3, **kw)
t = TableName("db", "archrace")
ids = []
for i in range(n):
    meta = TableUpdateMetadata.new("w" + wid, "commit " + wid + "/" + str(i))
    op = AddPartitionVersion(
        Partition((("p", wid + "-" + str(i)),)), generate_version()
    )
    tracker.commit(t, TableUpdate(meta, (op,)))
    ids.append(meta.commit_id)
print("DONE " + " ".join(ids))
"""


def _race_with_archiver(mode, path, monkey_sleep=0.02, consolidate=False):
    """Two writer processes commit while the parent archives in a loop
    (round 13: every other loop optionally CONSOLIDATES with a tiny
    chunk cap, so chunk rewrites + old-generation deletes race the
    writers too).  Returns (committed ids per worker, archival
    summaries)."""
    tracker = FileBackedVersionTracker(
        path, checkpoint_interval=3,
        **({"use_cas": True} if mode == "cas" else {"use_lock": True}),
    )
    tracker.init_table(T, is_snapshot=False, user_id="init")

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, mode, path, str(i + 1),
             str(N_PER_PROC)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    summaries = []
    loop_i = 0
    while any(p.poll() is None for p in procs):
        loop_i += 1
        out = tracker.archive_commits(
            T, retain_checkpoints=1,
            consolidate=consolidate and loop_i % 2 == 0,
            max_chunk_bytes=4096 if consolidate else 32 * 2**20,
        )
        if out["archived"] or out["repaired"]:
            summaries.append(out)  # mid-race archivals only, by construction
        time.sleep(monkey_sleep)
    mid_race_archived = sum(s["archived"] for s in summaries)
    outs = [p.communicate(timeout=120) for p in procs]
    worker_ids = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        assert out.startswith("DONE ")
        ids = out.strip().split()[1:]
        assert len(ids) == N_PER_PROC
        worker_ids.append(ids)
    # final sweep finishes any crash-shaped leftovers from the race
    tracker.archive_commits(T, retain_checkpoints=1)
    return worker_ids, mid_race_archived


def _assert_log_integrity(path, worker_ids):
    truth = FileBackedVersionTracker(path, checkpoint_interval=None)
    st = truth.table_state(T)
    ids = [u.metadata.commit_id for u in st.updates]
    assert len(set(ids)) == len(ids)  # no duplicate commit survives
    committed = set(sum(worker_ids, []))
    # NO LOST COMMIT: every update a worker reported committed is in the
    # merged (archive + live) log
    missing = committed - set(ids)
    assert not missing, f"{len(missing)} committed update(s) lost: {sorted(missing)[:3]}"
    assert len(ids) == 1 + 2 * N_PER_PROC
    # every worker partition is live in the fold (pure appends, distinct
    # partitions) — on the checkpointed fast path AND the full fold
    fast = FileBackedVersionTracker(path, checkpoint_interval=3)
    for tv in (truth.current_version(T), fast.current_version(T)):
        assert len(tv.partition_versions) == 2 * N_PER_PROC
    # the live directory holds nothing at-or-below the floor
    d = truth._table_dir(T)
    floor = truth._read_floor_seq(d)
    live = [
        int(n.split("_")[2].split(".")[0])
        for n in truth.fs.list_dir(d)
        if n.startswith("table_update_")
    ]
    if floor >= 0 and live:
        assert min(live) > floor


def test_cas_writers_race_archiver_no_commit_lost(tmp_path):
    """CAS mode, the object-store shape: conditional-create commits +
    monotonic floor CAS + post-claim re-check, raced by a repeatedly
    archiving parent from a THIRD process-independent tracker instance."""
    path = str(tmp_path / "log")
    worker_ids, mid_race_archived = _race_with_archiver("cas", path)
    assert mid_race_archived > 0  # archival really ran MID-race
    _assert_log_integrity(path, worker_ids)


def test_flock_writers_race_archiver_no_commit_lost(tmp_path):
    """use_lock mode: the parent's archive_commits takes the same table
    flock as the writers' commits, so archival serializes with them —
    every commit survives and the merged log folds identically."""
    path = str(tmp_path / "log")
    worker_ids, mid_race_archived = _race_with_archiver("lock", path)
    assert mid_race_archived > 0
    _assert_log_integrity(path, worker_ids)


def test_cas_race_exhaustive_version_at_after_race(tmp_path):
    """After the race + archival churn, version_at at EVERY surviving
    commit equals the checkpoint-free full fold — the exhaustive
    differential, post-concurrency."""
    from chronicles_spark.core import fold

    path = str(tmp_path / "log")
    worker_ids, _ = _race_with_archiver("cas", path, monkey_sleep=0.05)
    truth = FileBackedVersionTracker(path, checkpoint_interval=None)
    fast = FileBackedVersionTracker(path, checkpoint_interval=3)
    st = truth.table_state(T)
    for u in st.updates:
        cid = u.metadata.commit_id
        want = fold.current_version(
            fold.take_through(st.updates, cid), cid
        )
        assert fast.version_at(T, cid) == want, cid


def test_cas_writers_race_consolidating_archiver(tmp_path):
    """Round 13: the archiver CONSOLIDATES every other loop with a tiny
    chunk cap — chunk rewrites and old-generation deletes race the CAS
    writers' claims and each other's repair.  No commit lost, every
    sequence slot single-owner, exhaustive integrity after the churn."""
    path = str(tmp_path / "log")
    worker_ids, mid_race_archived = _race_with_archiver(
        "cas", path, consolidate=True
    )
    assert mid_race_archived > 0
    _assert_log_integrity(path, worker_ids)
    # the surviving artifact set is a DISJOINT chunked cover
    from chronicles_spark.trackers.files import (
        _ARCHIVE_FILE_RE,
        _archive_first_seq,
    )

    truth = FileBackedVersionTracker(path, checkpoint_interval=None)
    d = truth._table_dir(T)
    spans = sorted(
        (_archive_first_seq(n), int(_ARCHIVE_FILE_RE.match(n).group("last")))
        for n in truth.fs.list_dir(d)
        if _ARCHIVE_FILE_RE.match(n)
    )
    assert spans and all(f is not None for f, _ in spans)
    assert all(b[0] > a[1] for a, b in zip(spans, spans[1:]))


_ARCHIVER = """
import json, sys, time
from chronicles_spark.core.model import TableName
from chronicles_spark.trackers import FileBackedVersionTracker

import pytest


path, seconds = sys.argv[1], float(sys.argv[2])
tracker = FileBackedVersionTracker(path, checkpoint_interval=3, use_cas=True)
t = TableName("db", "archrace")
stop = time.time() + seconds
ran = skipped = 0
while time.time() < stop:
    out = tracker.archive_commits(
        t, retain_checkpoints=1,
        consolidate=(ran + skipped) % 2 == 0, max_chunk_bytes=4096,
    )
    if out.get("skipped_lease"):
        skipped += 1
    else:
        ran += 1
    time.sleep(0.01)
print(json.dumps({"ran": ran, "skipped": skipped}))
"""


def test_two_os_process_archivers_serialize_on_lease(tmp_path):
    """Round-13 review finding, raced for real: TWO archiver processes
    (both alternating consolidate with a tiny chunk cap) run against the
    same log while TWO writer processes commit.  The lease serializes
    the artifact mutators — no commit lost, no crash, no torn artifact
    set (a contended loop iteration no-ops with skipped_lease rather
    than deleting the other's in-flight generation)."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(
        path, checkpoint_interval=3, use_cas=True
    )
    tracker.init_table(T, is_snapshot=False, user_id="init")

    import json as _json

    env = dict(os.environ, PYTHONPATH=REPO)
    writers = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, "cas", path, str(i + 1),
             str(N_PER_PROC)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    archivers = [
        subprocess.Popen(
            [sys.executable, "-c", _ARCHIVER, path, "6"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for _ in range(2)
    ]
    worker_ids = []
    for p in writers:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"writer failed: {err[-2000:]}"
        worker_ids.append(out.strip().split()[1:])
    stats = []
    for p in archivers:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"archiver failed: {err[-2000:]}"
        stats.append(_json.loads(out.strip().splitlines()[-1]))
    assert sum(s["ran"] for s in stats) > 0
    # final sweep + full integrity (archive content, folds, floor)
    tracker.archive_commits(T, retain_checkpoints=1)
    _assert_log_integrity(path, worker_ids)
