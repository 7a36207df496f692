"""Fold-checkpoint behaviour of the file-backed tracker.

The checkpoint (``checkpoint_<seq>.json`` + ``_last_checkpoint`` pointer)
must make ``current_version`` O(tail) — reading only commits AFTER the
checkpoint seq — while reproducing the reference fold semantics exactly
(VersionTracker.scala:37-55,156-172), including rollback heads that predate
the checkpoint and rolled-back commits re-surfacing after a later write.
Differential style: every fast-path result is compared against the
checkpoint-free full fold of the same log directory.
"""

import json

import pytest

from chronicles_spark.core.model import Partition, SnapshotTableVersion, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    AddTableVersion,
    RemovePartition,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import FileBackedVersionTracker
from chronicles_spark.trackers.fs import FileSystem

T = TableName("db", "events")


class CountingFs(FileSystem):
    """Facade proxy recording every read_text path AND every directory
    listing (call count + dirents returned) — lets tests assert WHICH
    log files a resolution actually touched and how much LISTING it paid
    (the round-12 archival work's unit of cost: on an object store a
    listing is ~one paginated LIST call per 1000 dirents)."""

    def __init__(self, inner):
        self.inner = inner
        self.reads = []
        self.read_bytes = 0  # total characters returned across all reads
        self.lists = []     # one path per list_dir call
        self.dirents = 0    # total entries returned across all listings

    def exists(self, path):
        return self.inner.exists(path)

    def mkdirs(self, path):
        return self.inner.mkdirs(path)

    def read_text(self, path):
        self.reads.append(path)
        out = self.inner.read_text(path)
        self.read_bytes += len(out)
        return out

    def write_text(self, path, text):
        return self.inner.write_text(path, text)

    def list_dir(self, path):
        out = self.inner.list_dir(path)
        self.lists.append(path)
        self.dirents += len(out)
        return out

    def is_dir(self, path):
        return self.inner.is_dir(path)

    def remove_tree(self, path):
        return self.inner.remove_tree(path)

    def remove_file(self, path):
        return self.inner.remove_file(path)

    def join(self, *parts):
        return self.inner.join(*parts)

    # conditional-put surface must delegate too: without it the proxy
    # silently downgrades commits to the legacy overwrite-capable path
    # (exactly the hazard test_fresh_instance_commit... pins)
    def supports_put_if_absent(self):
        return self.inner.supports_put_if_absent()

    def write_text_if_absent(self, path, text):
        return self.inner.write_text_if_absent(path, text)

    def supports_put_if_match(self):
        return self.inner.supports_put_if_match()

    def read_text_and_token(self, path):
        self.reads.append(path)
        return self.inner.read_text_and_token(path)

    def write_text_if_match(self, path, text, token):
        return self.inner.write_text_if_match(path, text, token)

    def mtime(self, path):
        return self.inner.mtime(path)


def _commit(tracker, *ops, msg="u"):
    meta = TableUpdateMetadata.new("alice", msg)
    tracker.commit(T, TableUpdate(meta, tuple(ops)))
    return meta.commit_id


def _add(p, v=None):
    return AddPartitionVersion(Partition.parse(p), v or generate_version())


def _full_fold(root):
    """Ground truth: a checkpoint-free tracker over the same directory."""
    return FileBackedVersionTracker(root, checkpoint_interval=None).current_version(T)


def _build_log(root, n_commits=25, interval=10):
    tr = FileBackedVersionTracker(root, checkpoint_interval=interval)
    tr.init_table(T, is_snapshot=False, user_id="alice")
    commits = []
    for i in range(n_commits):
        p = f"date=2024-01-{(i % 7) + 1:02d}"
        if i % 9 == 8:
            commits.append(_commit(tr, RemovePartition(Partition.parse(p))))
        else:
            commits.append(_commit(tr, _add(p)))
    return tr, commits


def _ckpt_files(tr):
    d = tr._table_dir(T)
    return sorted(n for n in tr.fs.list_dir(d) if n.startswith("checkpoint_"))


def test_checkpoint_written_every_interval(tmp_path):
    tr, _ = _build_log(str(tmp_path / "log"), n_commits=25, interval=10)
    # init + 25 commits = 26 files → checkpoints at 10 and 20 commits seen
    assert len(_ckpt_files(tr)) == 2
    d = tr._table_dir(T)
    ptr = json.loads(tr.fs.read_text(tr.fs.join(d, "_last_checkpoint")))
    assert f"checkpoint_{ptr['seq']:013d}.json" == _ckpt_files(tr)[-1]


def test_fast_path_matches_full_fold(tmp_path):
    root = str(tmp_path / "log")
    tr, _ = _build_log(root, n_commits=25, interval=10)
    assert tr.current_version(T).partition_versions == _full_fold(
        root
    ).partition_versions


def test_resolution_reads_only_tail(tmp_path):
    root = str(tmp_path / "log")
    _build_log(root, n_commits=25, interval=10)
    # cold tracker instance: no in-process state, everything from disk
    cold = FileBackedVersionTracker(root, checkpoint_interval=10)
    cfs = CountingFs(cold.fs)
    cold.fs = cfs
    cold.current_version(T)
    update_reads = [p for p in cfs.reads if "table_update_" in p]
    ckpt_reads = [p for p in cfs.reads if "checkpoint_" in p]
    assert len(ckpt_reads) == 1
    d = cold._table_dir(T)
    ckpt_seq = json.loads(cold.fs.read_text(cold.fs.join(d, "_last_checkpoint")))[
        "seq"
    ]
    # ONLY commits after the checkpoint seq were read: 26 files total,
    # checkpoint covers the first 20, tail = 6
    assert update_reads, "expected some tail reads"
    for p in update_reads:
        seq = int(p.rsplit("table_update_", 1)[1].split(".")[0])
        assert seq > ckpt_seq, f"read a pre-checkpoint commit file: {p}"
    assert len(update_reads) == 26 - 20


def test_rollback_before_checkpoint_falls_back(tmp_path):
    root = str(tmp_path / "log")
    tr, commits = _build_log(root, n_commits=25, interval=10)
    early = commits[3]  # inside the checkpointed prefix
    tr.set_current_version(T, early)
    got = tr.current_version(T)
    want = FileBackedVersionTracker(root, checkpoint_interval=None)
    want._set_head(T, early)  # same head on the ground-truth instance
    assert got.partition_versions == want.current_version(T).partition_versions


def test_write_after_rollback_resurfaces_commits(tmp_path):
    # reference semantics: a write after checkout re-advances the head past
    # the rolled-back commits, so they fold back into view
    # (DatePartitionedTableSpec.scala:129-151 behaviour)
    root = str(tmp_path / "log")
    tr, commits = _build_log(root, n_commits=25, interval=10)
    tr.set_current_version(T, commits[3])
    _commit(tr, _add("date=2024-02-01"))
    assert tr.current_version(T).partition_versions == _full_fold(
        root
    ).partition_versions


def test_corrupt_pointer_degrades_to_full_fold(tmp_path):
    root = str(tmp_path / "log")
    tr, _ = _build_log(root, n_commits=25, interval=10)
    d = tr._table_dir(T)
    want = _full_fold(root).partition_versions
    tr.fs.write_text(tr.fs.join(d, "_last_checkpoint"), "not json{")
    assert tr.current_version(T).partition_versions == want
    tr.fs.write_text(tr.fs.join(d, "_last_checkpoint"), json.dumps({"seq": 999}))
    assert tr.current_version(T).partition_versions == want


def test_snapshot_table_checkpoint(tmp_path):
    root = str(tmp_path / "log")
    tr = FileBackedVersionTracker(root, checkpoint_interval=5)
    tr.init_table(T, is_snapshot=True, user_id="alice")
    versions, commits = [], []
    for _ in range(12):
        v = generate_version()
        versions.append(v)
        commits.append(_commit(tr, AddTableVersion(v)))
    assert _ckpt_files(tr)
    got = tr.current_version(T)
    assert isinstance(got, SnapshotTableVersion)
    assert got.version == versions[-1]
    # rollback into the checkpointed prefix
    tr.set_current_version(T, commits[2])
    assert tr.current_version(T).version == versions[2]


def test_memory_fs_checkpoints(tmp_path):
    tr = FileBackedVersionTracker(
        f"memory://ckpt-{tmp_path.name}/log", checkpoint_interval=4
    )
    tr.init_table(T, is_snapshot=False, user_id="alice")
    for i in range(9):
        _commit(tr, _add(f"date=2024-01-{i + 1:02d}"))
    assert _ckpt_files(tr)
    assert len(tr.current_version(T).partition_versions) == 9


def test_disabled_interval_writes_no_checkpoints(tmp_path):
    root = str(tmp_path / "log")
    tr = FileBackedVersionTracker(root, checkpoint_interval=None)
    tr.init_table(T, is_snapshot=False, user_id="alice")
    for i in range(30):
        _commit(tr, _add(f"date=2024-01-{i + 1:02d}"))
    assert _ckpt_files(tr) == []


def test_interval_validation(tmp_path):
    with pytest.raises(ValueError):
        FileBackedVersionTracker(str(tmp_path / "log"), checkpoint_interval=0)


def test_tombstone_across_checkpoint_boundary(tmp_path):
    # a partition added BEFORE the checkpoint and removed AFTER it must be
    # absent; re-added after that, present with the fresh version
    root = str(tmp_path / "log")
    tr = FileBackedVersionTracker(root, checkpoint_interval=5)
    tr.init_table(T, is_snapshot=False, user_id="alice")
    p = Partition.parse("date=2024-01-01")
    _commit(tr, _add("date=2024-01-01"))
    for i in range(5):  # push a checkpoint past the add
        _commit(tr, _add(f"date=2024-02-{i + 1:02d}"))
    assert _ckpt_files(tr)
    _commit(tr, RemovePartition(p))
    assert p not in tr.current_version(T).partition_versions
    fresh = generate_version()
    _commit(tr, _add("date=2024-01-01", fresh))
    assert tr.current_version(T).partition_versions[p] == fresh
    assert tr.current_version(T).partition_versions == _full_fold(
        root
    ).partition_versions


def test_version_at_fast_path_reads_only_tail(tmp_path):
    root = str(tmp_path / "log")
    _, commits = _build_log(root, n_commits=25, interval=10)
    cold = FileBackedVersionTracker(root, checkpoint_interval=10)
    cfs = CountingFs(cold.fs)
    cold.fs = cfs
    target = commits[-2]  # in the tail (after the seq-20 checkpoint)
    got = cold.version_at(T, target)
    ckpt_seq = 20  # init + 25 commits; checkpoints at 10 and 20 files... read pointer
    d = cold._table_dir(T)
    import json as _json

    ckpt_seq = _json.loads(cold.fs.read_text(cold.fs.join(d, "_last_checkpoint")))[
        "seq"
    ]
    for p in (p for p in cfs.reads if "table_update_" in p):
        seq = int(p.rsplit("table_update_", 1)[1].split(".")[0])
        assert seq > ckpt_seq, f"read a pre-checkpoint commit file: {p}"
    # differential: equals the checkpoint-free fold at the same commit
    want = FileBackedVersionTracker(root, checkpoint_interval=None).version_at(
        T, target
    )
    assert got.partition_versions == want.partition_versions


def test_version_at_deep_history_falls_back(tmp_path):
    root = str(tmp_path / "log")
    _, commits = _build_log(root, n_commits=25, interval=10)
    tr = FileBackedVersionTracker(root, checkpoint_interval=10)
    got = tr.version_at(T, commits[2])
    want = FileBackedVersionTracker(root, checkpoint_interval=None).version_at(
        T, commits[2]
    )
    assert got.partition_versions == want.partition_versions


def test_version_at_unknown_commit_raises(tmp_path):
    from chronicles_spark.trackers import UnknownCommitError

    root = str(tmp_path / "log")
    tr, _ = _build_log(root, n_commits=25, interval=10)
    from chronicles_spark.trackers import UnknownCommitError as _UCE

    with pytest.raises(_UCE):
        tr.version_at(T, "no-such-commit")
    # and on the checkpoint-free path too
    with pytest.raises(UnknownCommitError):
        FileBackedVersionTracker(root, checkpoint_interval=None).version_at(
            T, "no-such-commit"
        )


# -- sqlite checkpoints (same contract as the files tracker's) --------------


def _sqlite_log(path, n_commits=25, interval=10):
    from chronicles_spark.trackers import SqliteVersionTracker

    tr = SqliteVersionTracker(path, checkpoint_interval=interval)
    tr.init_table(T, is_snapshot=False, user_id="alice")
    commits = []
    for i in range(n_commits):
        p = f"date=2024-01-{(i % 7) + 1:02d}"
        if i % 9 == 8:
            commits.append(_commit(tr, RemovePartition(Partition.parse(p))))
        else:
            commits.append(_commit(tr, _add(p)))
    return tr, commits


def test_sqlite_checkpoint_fast_path_matches_full_fold(tmp_path):
    from chronicles_spark.trackers import SqliteVersionTracker

    path = str(tmp_path / "log.db")
    tr, commits = _sqlite_log(path, n_commits=25, interval=10)
    # checkpoint row exists and summarizes a prefix
    row = tr._read_checkpoint_row(T.fully_qualified)
    assert row is not None and row[0] >= 10
    # fast path == checkpoint-free ground truth over the same db
    want = SqliteVersionTracker(path, checkpoint_interval=None).current_version(T)
    assert tr.current_version(T) == want
    # cold instance takes the fast path too
    cold = SqliteVersionTracker(path, checkpoint_interval=10)
    assert cold.current_version(T) == want


def test_sqlite_version_at_and_rollback_fall_back(tmp_path):
    from chronicles_spark.trackers import SqliteVersionTracker

    path = str(tmp_path / "log.db")
    tr, commits = _sqlite_log(path, n_commits=25, interval=10)
    truth = SqliteVersionTracker(path, checkpoint_interval=None)
    # time travel to every commit agrees with the full fold (deep commits
    # exercise the precedes-checkpoint fallback, late ones the fast path)
    for cid in commits[::4]:
        assert tr.version_at(T, cid) == truth.version_at(T, cid)
    # head rolled back BEFORE the checkpoint still resolves correctly
    tr.set_current_version(T, commits[2])
    assert tr.current_version(T) == truth.version_at(T, commits[2])
    from chronicles_spark.trackers import UnknownCommitError as _UCE

    with pytest.raises(_UCE):
        tr.version_at(T, "no-such-commit")


def test_sqlite_snapshot_checkpoint_and_group_commit(tmp_path):
    from chronicles_spark.core.ops import AddTableVersion
    from chronicles_spark.trackers import SqliteVersionTracker

    path = str(tmp_path / "log.db")
    tr = SqliteVersionTracker(path, checkpoint_interval=5)
    snap = TableName("db", "snap")
    tr.init_table(snap, is_snapshot=True, user_id="alice")
    versions = []
    for i in range(12):
        v = generate_version()
        versions.append(v)
        meta = TableUpdateMetadata.new("alice", f"s{i}")
        tr.commit(snap, TableUpdate(meta, (AddTableVersion(v),)))
    assert tr._read_checkpoint_row(snap.fully_qualified) is not None
    assert tr.current_version(snap).version == versions[-1]
    truth = SqliteVersionTracker(path, checkpoint_interval=None)
    assert tr.current_version(snap) == truth.current_version(snap)


class ListCountingFs(CountingFs):
    """CountingFs that also counts directory LISTINGS — the per-commit
    cost the round-7 O(1) cadence fast path removes."""

    def __init__(self, inner):
        super().__init__(inner)
        self.listings = 0

    def list_dir(self, path):
        self.listings += 1
        return self.inner.list_dir(path)


def test_commit_does_not_list_per_commit(tmp_path):
    """Bulk loads must not pay a full directory LISTING per commit: the
    exact checkpoint check (which lists) runs once per interval via the
    instance-local pending counter, so N commits cost O(N/interval)
    listings — not O(N) (which made bulk loads O(N²) in dirents before
    round 7).  Cadence is unchanged: checkpoints still cut and the
    fast-path fold still agrees with the full fold."""
    from chronicles_spark.trackers.fs import LocalFileSystem

    fs = ListCountingFs(LocalFileSystem())
    tr = FileBackedVersionTracker(str(tmp_path), fs=fs, checkpoint_interval=50)
    tr.init_table(T, is_snapshot=False, user_id="alice")
    fs.listings = 0
    for i in range(300):
        _commit(tr, _add(f"date=2024-01-{(i % 7) + 1:02d}"))
    # 300 commits / interval 50 → ~6 exact checks (each may list a couple
    # of times); anywhere near 300 means the fast path regressed
    assert fs.listings < 40, f"{fs.listings} listings for 300 commits"
    assert len(_ckpt_files(tr)) >= 5  # cadence preserved
    assert tr.current_version(T) == _full_fold(str(tmp_path))

    # a FRESH instance (cold counter) keeps committing and checkpointing
    tr2 = FileBackedVersionTracker(str(tmp_path), fs=fs, checkpoint_interval=50)
    before = len(_ckpt_files(tr))
    for i in range(60):
        meta = TableUpdateMetadata.new("bob", "x")
        tr2.commit(T, TableUpdate(meta, (_add(f"date=2024-02-{(i % 7) + 1:02d}"),)))
    assert len(_ckpt_files(tr2)) > before
    assert tr2.current_version(T) == _full_fold(str(tmp_path))


def test_fresh_instance_commit_never_overwrites_a_slot(tmp_path):
    """A burst of >1 commit/ms runs the per-instance monotonic clock
    ahead of wall time; a FRESH tracker's next commit then lands on an
    already-claimed sequence slot.  Before round 7 the plain (no-lock)
    path write_text'd over it — silently destroying the committed update
    it replaced.  The conditional-create + bump fix must keep EVERY
    commit: file count grows by exactly one and all prior commit ids
    stay readable."""
    import os as _os

    tr = FileBackedVersionTracker(str(tmp_path), checkpoint_interval=None)
    tr.init_table(T, is_snapshot=False, user_id="a")
    ids = [_commit(tr, _add(f"date=2024-01-{(i % 7) + 1:02d}")) for i in range(300)]
    d = tr._table_dir(T)

    def n_files():
        return sum(1 for n in _os.listdir(d) if n.startswith("table_update"))

    before = n_files()
    tr2 = FileBackedVersionTracker(str(tmp_path), checkpoint_interval=None)
    meta = TableUpdateMetadata.new("b", "fresh")
    tr2.commit(T, TableUpdate(meta, (_add("date=2024-02-01"),)))
    assert n_files() == before + 1  # landed as a NEW file, no overwrite
    got = [u.metadata.commit_id for u in tr2.table_state(T).updates]
    assert meta.commit_id in got
    for cid in ids:
        assert cid in got  # nothing was destroyed
