"""Concurrent commits: the reference allows concurrent writers (conflict
resolution out of scope, README.md:53-55) with SERIALIZABLE commit
transactions on the DB tracker (DbVersionTracker.scala:118-124) and
last-writer-wins on the file tracker (FileBackedVersionTracker.scala:23-25).
These tests pin the rebuild to the same guarantees: no commit is lost or
torn under concurrency, and the log stays totally ordered."""

import threading
from datetime import datetime, timezone

import pytest

from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import (
    FileBackedVersionTracker,
    InMemoryVersionTracker,
    SqliteVersionTracker,
)

T = TableName("db", "hot")
N_THREADS = 8
COMMITS_PER_THREAD = 25


def _hammer(tracker):
    tracker.init_table(T, is_snapshot=False, user_id="init")
    errors = []

    def work(tid):
        try:
            for i in range(COMMITS_PER_THREAD):
                meta = TableUpdateMetadata.new(f"w{tid}", f"commit {tid}/{i}")
                op = AddPartitionVersion(
                    Partition((("date", f"2020-01-{tid + 1:02d}"),)),
                    generate_version(),
                )
                tracker.commit(T, TableUpdate(meta, (op,)))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(N_THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    return tracker.table_state(T)


@pytest.mark.parametrize("backend", ["memory", "sqlite", "files"])
def test_concurrent_commits_none_lost(backend, tmp_path):
    tracker = {
        "memory": lambda: InMemoryVersionTracker(),
        "sqlite": lambda: SqliteVersionTracker(str(tmp_path / "log.db")),
        "files": lambda: FileBackedVersionTracker(str(tmp_path / "log")),
    }[backend]()
    state = _hammer(tracker)
    # init + every commit from every thread, none lost or torn
    assert len(state.updates) == 1 + N_THREADS * COMMITS_PER_THREAD
    commit_ids = [u.metadata.commit_id for u in state.updates]
    assert len(set(commit_ids)) == len(commit_ids)
    # every commit carries exactly its one operation (no torn writes)
    assert all(len(u.operations) == 1 for u in state.updates[1:])
    # head points at a real commit and the folded state resolves
    assert state.current_version in commit_ids
    live = tracker.current_version(T)
    assert len(live.partition_versions) == N_THREADS  # one date per thread
