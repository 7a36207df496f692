"""Two-OS-PROCESS commit races (the in-process thread suite is
tests/test_concurrency.py; threads share one tracker instance and its
lock, so they never exercise cross-process isolation).

Pinned guarantees, matching the reference:
* sqlite backend — commits from separate processes serialize on the
  database file lock (SERIALIZABLE, DbVersionTracker.scala:118-124): every
  commit survives, none torn, total order intact.
* files backend — documented last-writer-wins
  (FileBackedVersionTracker.scala:23-25): concurrent head_ref overwrites
  and ms-resolution commit-filename collisions may drop commits, but the
  log is never TORN — every surviving file parses, commit ids stay unique,
  and at least one process's full commit set survives.
"""

import json
import os
import subprocess
import sys

import pytest

from chronicles_spark.core.model import TableName
from chronicles_spark.trackers import FileBackedVersionTracker, SqliteVersionTracker

# slow tier: real OS-process commit races (run via -m "slow or not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T = TableName("db", "race")
N_PER_PROC = 20

_WORKER = """
import sys
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion, TableUpdate, TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import FileBackedVersionTracker, SqliteVersionTracker

backend, path, wid, n = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
if backend == "sqlite":
    tracker = SqliteVersionTracker(path)
elif backend == "files_locked":
    tracker = FileBackedVersionTracker(path, use_lock=True)
elif backend == "files_cas":
    tracker = FileBackedVersionTracker(path, use_cas=True)
elif backend == "files_cas_ckpt":
    tracker = FileBackedVersionTracker(path, use_cas=True, checkpoint_interval=3)
else:
    tracker = FileBackedVersionTracker(path)
t = TableName("db", "race")
done = 0
for i in range(n):
    meta = TableUpdateMetadata.new("w" + wid, "commit " + wid + "/" + str(i))
    op = AddPartitionVersion(
        Partition((("date", "2020-01-" + wid.zfill(2)),)), generate_version()
    )
    tracker.commit(t, TableUpdate(meta, (op,)))
    done += 1
print("DONE", done)
"""


def _race(backend, path, n_procs=2):
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, backend, path, str(i + 1), str(N_PER_PROC)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(n_procs)
    ]
    outs = [p.communicate(timeout=120) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        assert f"DONE {N_PER_PROC}" in out
    return n_procs


def test_sqlite_two_process_commits_all_serialize(tmp_path):
    """Separate OS processes, one sqlite file: the db lock is the
    serialization point — EVERY commit survives."""
    path = str(tmp_path / "log.db")
    tracker = SqliteVersionTracker(path)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    n_procs = _race("sqlite", path)

    state = SqliteVersionTracker(path).table_state(T)
    assert len(state.updates) == 1 + n_procs * N_PER_PROC  # none lost
    ids = [u.metadata.commit_id for u in state.updates]
    assert len(set(ids)) == len(ids)
    assert all(len(u.operations) == 1 for u in state.updates[1:])  # none torn
    assert state.current_version in ids
    live = SqliteVersionTracker(path).current_version(T)
    assert len(live.partition_versions) == n_procs  # one date per worker


def test_files_locked_two_process_commits_all_serialize(tmp_path):
    """use_lock=True: the per-table flock serializes commits across OS
    processes — EVERY commit survives, filenames never collide."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_lock=True)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    n_procs = _race("files_locked", path)

    state = FileBackedVersionTracker(path).table_state(T)
    assert len(state.updates) == 1 + n_procs * N_PER_PROC  # none lost
    ids = [u.metadata.commit_id for u in state.updates]
    assert len(set(ids)) == len(ids)
    assert all(len(u.operations) == 1 for u in state.updates[1:])
    assert state.current_version in ids


def test_files_cas_two_process_commits_all_survive(tmp_path):
    """use_cas=True: commit files are claimed with link(2)-based atomic
    create-if-absent — NO flock, yet every commit from both OS processes
    survives (the default mode may drop colliding same-ms commits; CAS
    mode's contract is no commit file is ever overwritten).  The head may
    trail the newest file by the documented advance window; one quiescent
    commit converges it."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_cas=True)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    n_procs = _race("files_cas", path)

    reader = FileBackedVersionTracker(path, use_cas=True)
    state = reader.table_state(T)
    assert len(state.updates) == 1 + n_procs * N_PER_PROC  # none lost
    ids = [u.metadata.commit_id for u in state.updates]
    assert len(set(ids)) == len(ids)
    assert all(len(u.operations) == 1 for u in state.updates[1:])  # none torn
    assert state.current_version in ids
    live = reader.current_version(T)
    assert len(live.partition_versions) == n_procs  # one date per worker


def test_files_cas_with_checkpoints_two_process_race(tmp_path):
    """CAS commits + fold checkpoints + two OS processes at once: both
    writers checkpoint concurrently (interval=3 over 40+ commits), and the
    final checkpointed resolution must equal a full-fold ground truth —
    pinning that racing checkpoint files/pointers can cost only tail
    length, never correctness."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_cas=True, checkpoint_interval=3)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    n_procs = _race("files_cas_ckpt", path)

    reader = FileBackedVersionTracker(path, use_cas=True, checkpoint_interval=3)
    state = reader.table_state(T)
    assert len(state.updates) == 1 + n_procs * N_PER_PROC  # none lost
    # checkpoints were actually written during the race
    d = os.path.join(path, f"_chronicles_table_{T.fully_qualified}")
    cks = [f for f in os.listdir(d) if f.startswith("checkpoint_")]
    assert cks, "no checkpoint written during the race"
    # checkpointed resolution == full-fold ground truth
    truth = FileBackedVersionTracker(path, checkpoint_interval=None)
    assert reader.current_version(T) == truth.current_version(T)
    # and the _last_checkpoint pointer names a real, parseable artifact
    import json as _json
    ptr = _json.loads(open(os.path.join(d, "_last_checkpoint")).read())
    ck = _json.loads(
        open(os.path.join(d, f"checkpoint_{ptr['seq']:013d}.json")).read()
    )
    assert int(ck["last_seq"]) == int(ptr["seq"])


def test_files_lock_requires_local_fs():
    with pytest.raises(ValueError, match="local filesystem"):
        FileBackedVersionTracker("memory://b/lock", use_lock=True)


def test_files_two_process_commits_last_writer_wins(tmp_path):
    """Separate OS processes, one log directory: commits may be dropped by
    head_ref / filename collisions (documented last-writer-wins), but the
    surviving log is never torn."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    n_procs = _race("files", path)

    state = FileBackedVersionTracker(path).table_state(T)
    n = len(state.updates)
    # every collision between the two processes keeps one of the pair:
    # at least one process's full set survives, at most all commits do
    assert 1 + N_PER_PROC <= n <= 1 + n_procs * N_PER_PROC
    ids = [u.metadata.commit_id for u in state.updates]
    assert len(set(ids)) == len(ids)
    assert all(len(u.operations) == 1 for u in state.updates[1:])
    # every surviving commit file is valid JSON with intact metadata
    d = os.path.join(path, f"_chronicles_table_{T.fully_qualified}")
    for f in os.listdir(d):
        if f.startswith("table_update_"):
            parsed = json.loads(open(os.path.join(d, f)).read())
            assert parsed["commit_id"] and parsed["operations"]


_OCC_WORKER = """
import sys
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion, TableUpdate, TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import CommitConflictError, FileBackedVersionTracker

path, wid, expected_head, date = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
tracker = FileBackedVersionTracker(path, use_lock=True)
t = TableName("db", "race")
meta = TableUpdateMetadata.new("w" + wid, "occ " + wid)
op = AddPartitionVersion(Partition((("date", date),)), generate_version())
try:
    tracker.commit(t, TableUpdate(meta, (op,)), expected_head=expected_head)
    print("COMMITTED", meta.commit_id)
except CommitConflictError:
    print("CONFLICT")
"""


def _occ_race(path, expected_head, dates):
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _OCC_WORKER, path, str(i + 1), expected_head, d],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i, d in enumerate(dates)
    ]
    outs = [p.communicate(timeout=120) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
    return [out.split()[0] for out, _ in outs]


def test_occ_two_process_same_partition_exactly_one_wins(tmp_path):
    """Two OS processes race an optimistic commit of the SAME partition from
    the SAME base head over the flock-mode files tracker: the flock makes the
    check-then-append atomic, so exactly one lands and the other sees
    CommitConflictError (Delta/Iceberg-style OCC; the unlocked default stays
    last-writer-wins as the reference documents)."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_lock=True)
    tracker.init_table(T, is_snapshot=False, user_id="init")
    base = tracker.table_state(T).current_version

    results = sorted(_occ_race(path, base, ["2020-01-01", "2020-01-01"]))
    assert results == ["COMMITTED", "CONFLICT"]
    state = FileBackedVersionTracker(path).table_state(T)
    assert len(state.updates) == 2  # init + the single winner


def test_occ_two_process_disjoint_partitions_both_land(tmp_path):
    """Same race with DISJOINT partitions: partition-level auto-merge lets
    both optimistic commits land despite the moved head."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_lock=True)
    tracker.init_table(T, is_snapshot=False, user_id="init")
    base = tracker.table_state(T).current_version

    results = _occ_race(path, base, ["2020-01-01", "2020-01-02"])
    assert results == ["COMMITTED", "COMMITTED"]
    live = FileBackedVersionTracker(path).current_version(T)
    assert len(live.partition_versions) == 2


_TAG_WORKER = """
import sys
from chronicles_spark.core.model import TableName
from chronicles_spark.trackers import FileBackedVersionTracker

path, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
tracker = FileBackedVersionTracker(path, use_lock=True)
t = TableName("db", "race")
wins = 0
for i in range(n):
    try:
        tracker.set_tag(t, "pin-" + str(i))
        wins += 1
    except ValueError:
        pass  # the other process won this tag
print("WINS", wins)
"""


def test_set_tag_exactly_one_winner_across_processes(tmp_path):
    """Two OS processes race set_tag on the SAME tag names over a flock-mode
    files tracker: the exists-check-then-write is bracketed by the commit
    flock, so every tag name gets exactly one winner — the loser sees the
    immutability ValueError, never a silent overwrite."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_lock=True)
    tracker.init_table(T, is_snapshot=False, user_id="init")

    env = dict(os.environ, PYTHONPATH=REPO)
    n_tags = 25
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TAG_WORKER, path, str(w), str(n_tags)],
            env=env, stdout=subprocess.PIPE, text=True,
        )
        for w in range(2)
    ]
    outs = [p.communicate(timeout=120)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    wins = [int(o.strip().split()[-1]) for o in outs]
    assert sum(wins) == n_tags, f"wins {wins}: every tag exactly once"
    assert len(tracker.tags(T)) == n_tags


_GROUP_WORKER = """
import sys
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion, TableUpdate, TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import SqliteVersionTracker

path, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
tracker = SqliteVersionTracker(path)
ta, tb = TableName("db", "docs"), TableName("db", "embs")
for i in range(n):
    group = {}
    for t in (ta, tb):
        meta = TableUpdateMetadata.new("w" + wid, "g " + wid + "/" + str(i))
        op = AddPartitionVersion(
            Partition((("d", wid),)), generate_version()
        )
        group[t] = TableUpdate(meta, (op,))
    tracker.commit_group(group)
print("DONE", n)
"""


def test_sqlite_two_process_group_commits_never_tear(tmp_path):
    """Two OS processes firing commit_group at one sqlite file: the group
    txn is the serialization point, so BOTH tables always hold the same
    number of group commits — no group is ever half-visible."""
    path = str(tmp_path / "log.db")
    tracker = SqliteVersionTracker(path)
    ta, tb = TableName("db", "docs"), TableName("db", "embs")
    tracker.init_table(ta, is_snapshot=False, user_id="u")
    tracker.init_table(tb, is_snapshot=False, user_id="u")

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _GROUP_WORKER, path, str(i + 1), str(N_PER_PROC)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        assert f"DONE {N_PER_PROC}" in out

    fresh = SqliteVersionTracker(path)
    ups_a = fresh.updates(ta)
    ups_b = fresh.updates(tb)
    assert len(ups_a) == len(ups_b) == 1 + 2 * N_PER_PROC  # init + all groups
    # every group message appears on BOTH tables (no torn group)
    msgs_a = {u.message for u in ups_a if u.message.startswith("g ")}
    msgs_b = {u.message for u in ups_b if u.message.startswith("g ")}
    assert msgs_a == msgs_b and len(msgs_a) == 2 * N_PER_PROC


_FILES_GROUP_WORKER = """
import sys
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion, TableUpdate, TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import FileBackedVersionTracker


path, wid, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
tracker = FileBackedVersionTracker(path, use_lock=True)
ta, tb = TableName("db", "docs"), TableName("db", "embs")
for i in range(n):
    group = {}
    for t in (ta, tb):
        meta = TableUpdateMetadata.new("w" + wid, "g " + wid + "/" + str(i))
        group[t] = TableUpdate(
            meta, (AddPartitionVersion(Partition((("d", wid),)), generate_version()),)
        )
    tracker.commit_group(group)
print("DONE", n)
"""


def test_files_flock_two_process_group_commits_never_tear(tmp_path):
    """Two OS processes firing commit_group at a flocked files log: the
    locks held across the whole group (acquired in sorted table order)
    serialize groups cross-process — both tables end with every group,
    same message sets, no torn group."""
    path = str(tmp_path / "log")
    tracker = FileBackedVersionTracker(path, use_lock=True)
    ta, tb = TableName("db", "docs"), TableName("db", "embs")
    tracker.init_table(ta, is_snapshot=False, user_id="u")
    tracker.init_table(tb, is_snapshot=False, user_id="u")

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _FILES_GROUP_WORKER, path, str(i + 1),
             str(N_PER_PROC)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        assert f"DONE {N_PER_PROC}" in out

    fresh = FileBackedVersionTracker(path, use_lock=True)
    ups_a = fresh.updates(ta)
    ups_b = fresh.updates(tb)
    assert len(ups_a) == len(ups_b) == 1 + 2 * N_PER_PROC
    msgs_a = {u.message for u in ups_a if u.message.startswith("g ")}
    msgs_b = {u.message for u in ups_b if u.message.startswith("g ")}
    assert msgs_a == msgs_b and len(msgs_a) == 2 * N_PER_PROC
