"""CAS (conditional-put) commit mode of the files tracker.

Object stores have no flock; `use_cas=True` serializes the commit LOG
through the store's own atomic create-if-absent (S3 If-None-Match / GCS
generation preconditions; link(2) locally). docs/scale.md "Multi-writer
commit safety" is the design; these tests pin:

* no commit file is ever overwritten, even when writers collide on a name
  (the silent-loss hazard of the default last-writer-wins mode),
* the head_ref advance is monotonic on commit sequence,
* the mode refuses filesystems without the capability up front,
* a two-thread race over one table loses nothing.
"""

import json
import threading

import pytest

from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import FileBackedVersionTracker
from chronicles_spark.trackers.fs import FileSystem, MemoryFileSystem

T = TableName("db", "cas")


def _commit(tracker, day, msg="w"):
    v = generate_version()
    meta = TableUpdateMetadata.new("u", msg)
    tracker.commit(
        T,
        TableUpdate(meta, (AddPartitionVersion(Partition.of(("d", day)), v),)),
    )
    return meta.commit_id


class RacingFS(MemoryFileSystem):
    """Injects a competitor: before the caller's first N conditional puts
    of a commit file, a phantom writer claims the same name — forcing the
    caller down the collision-retry path."""

    def __init__(self, bucket, steal_first_n=1):
        super().__init__(bucket)
        self.steals_left = steal_first_n
        self.stolen = []

    def write_text_if_absent(self, path, text):
        if "table_update_" in path and self.steals_left > 0:
            self.steals_left -= 1
            # the phantom writer's commit claims the name first (a VALID
            # log entry — readers parse every commit file)
            from chronicles_spark.core.ops import update_to_json

            phantom = TableUpdate(
                TableUpdateMetadata.new("phantom", "stolen slot"),
                (
                    AddPartitionVersion(
                        Partition.of(("d", "phantom")), generate_version()
                    ),
                ),
            )
            super().write_text_if_absent(path, update_to_json(phantom))
            self.stolen.append(path)
        return super().write_text_if_absent(path, text)


class NoCasFS(MemoryFileSystem):
    def supports_put_if_absent(self):
        return False


def test_refuses_fs_without_capability(tmp_path):
    with pytest.raises(ValueError, match="atomic create-if-absent"):
        FileBackedVersionTracker("root", fs=NoCasFS("nocas"), use_cas=True)


def test_cas_and_lock_are_exclusive(tmp_path):
    with pytest.raises(ValueError, match="alternative commit protocols"):
        FileBackedVersionTracker(str(tmp_path), use_cas=True, use_lock=True)


def test_collision_retries_next_slot_and_loses_nothing():
    fs = RacingFS("race1", steal_first_n=2)
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True)
    tr.init_table(T, is_snapshot=False, user_id="u")
    c1 = _commit(tr, "2024-01-01")
    assert len(fs.stolen) == 2  # init + first commit were both contested
    # both the phantom's files and ours exist — nothing overwritten
    d = tr._table_dir(T)
    names = [n for n in fs.list_dir(d) if n.startswith("table_update_")]
    payloads = [fs.read_text(fs.join(d, n)) for n in names]
    assert sum('"phantom"' in p for p in payloads) == 2
    assert sum(c1 in p for p in payloads) == 1
    # our commits remain resolvable (head still points at OUR commit —
    # the phantoms never advanced it, like a writer that died mid-commit)
    assert tr.table_state(T).current_version == c1


def test_local_disk_supports_cas(tmp_path):
    tr = FileBackedVersionTracker(str(tmp_path / "log"), use_cas=True)
    tr.init_table(T, is_snapshot=False, user_id="u")
    _commit(tr, "2024-01-01")
    c2 = _commit(tr, "2024-01-02")
    assert tr.table_state(T).current_version == c2
    tv = tr.current_version(T)
    assert len(tv.partition_versions) == 2
    # head_ref carries the monotonic seq in CAS mode
    d = tr._table_dir(T)
    head = json.loads(tr.fs.read_text(tr.fs.join(d, "head_ref")))
    assert head["head_ref"] == c2 and "seq" in head


def test_head_advance_is_monotonic():
    fs = MemoryFileSystem("mono")
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True)
    tr.init_table(T, is_snapshot=False, user_id="u")
    c1 = _commit(tr, "2024-01-01")
    d = tr._table_dir(T)
    head = json.loads(fs.read_text(fs.join(d, "head_ref")))
    # a straggler trying to re-point the head at an OLDER seq is skipped
    tr._advance_head(d, "stale-commit", head["seq"] - 1)
    head2 = json.loads(fs.read_text(fs.join(d, "head_ref")))
    assert head2["head_ref"] == c1 and head2["seq"] == head["seq"]
    # while a newer seq still advances
    tr._advance_head(d, "newer-commit", head["seq"] + 1)
    assert json.loads(fs.read_text(fs.join(d, "head_ref")))["head_ref"] == (
        "newer-commit"
    )


def test_two_thread_race_loses_no_commits(tmp_path):
    """Two writer instances (separate tracker objects, shared directory,
    NO flock) race 15 commits each through the CAS protocol: every commit
    file must survive and the final fold must contain every partition."""
    root = str(tmp_path / "log")
    trs = [FileBackedVersionTracker(root, use_cas=True) for _ in range(2)]
    trs[0].init_table(T, is_snapshot=False, user_id="u")
    errs = []

    def work(i):
        try:
            for k in range(15):
                _commit(trs[i], f"2024-{i:02d}-{k:02d}", msg=f"w{i}.{k}")
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    reader = FileBackedVersionTracker(root, use_cas=True)
    assert len(reader.table_state(T).updates) == 1 + 30  # init + every commit
    # the documented head-advance window can park the head ONE commit
    # behind the newest file until the next advance; a single quiescent
    # commit must converge it and surface every raced partition
    final = _commit(reader, "9999-12-31", msg="converge")
    state = reader.table_state(T)
    assert state.current_version == final
    assert state.updates[-1].metadata.commit_id == final
    assert len(reader.current_version(T).partition_versions) == 31


# -- token CAS (If-Match / generation preconditions) ------------------------


def test_memory_fs_token_cas_semantics():
    fs = MemoryFileSystem("tok1")
    assert fs.supports_put_if_match()
    # create-if-absent via token=None
    assert fs.write_text_if_match("b/x", "v1", None) is True
    assert fs.write_text_if_match("b/x", "v1b", None) is False
    text, tok = fs.read_text_and_token("b/x")
    assert text == "v1"
    # swap succeeds with the fresh token, exactly once
    assert fs.write_text_if_match("b/x", "v2", tok) is True
    assert fs.write_text_if_match("b/x", "v3", tok) is False  # stale token
    # a PLAIN write also invalidates outstanding tokens (rollback path)
    _, tok2 = fs.read_text_and_token("b/x")
    fs.write_text("b/x", "v2")  # same content, new generation
    assert fs.write_text_if_match("b/x", "v4", tok2) is False


def test_local_fs_token_cas_semantics(tmp_path):
    from chronicles_spark.trackers.fs import LocalFileSystem

    fs = LocalFileSystem()
    p = str(tmp_path / "head")
    assert fs.supports_put_if_match()
    assert fs.write_text_if_match(p, "v1", None) is True
    assert fs.write_text_if_match(p, "v1b", None) is False
    text, tok = fs.read_text_and_token(p)
    assert text == "v1"
    assert fs.write_text_if_match(p, "v2", tok) is True
    assert fs.write_text_if_match(p, "v3", tok) is False


def test_head_advance_atomic_under_token_cas():
    """With token CAS available, a straggler's advance LOSES the swap and
    re-reads instead of clobbering a newer head — the head can never move
    backwards even inside the old read-check-write window."""
    fs = MemoryFileSystem("tok2")
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True)
    tr.init_table(T, is_snapshot=False, user_id="u")
    c1 = _commit(tr, "2024-01-01")
    d = tr._table_dir(T)
    head = json.loads(fs.read_text(fs.join(d, "head_ref")))

    # simulate the straggler: it read the head BEFORE c1 landed (stale
    # token), then tries to advance to a LOWER seq — must be a no-op
    tr._advance_head(d, "straggler", head["seq"] - 1)
    assert json.loads(fs.read_text(fs.join(d, "head_ref")))["head_ref"] == c1

    # and a higher-seq advance still lands atomically
    tr._advance_head(d, "newer", head["seq"] + 1)
    assert json.loads(fs.read_text(fs.join(d, "head_ref")))["head_ref"] == "newer"


def test_checkpoint_pointer_monotonic_in_cas_mode():
    fs = MemoryFileSystem("tok3")
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True, checkpoint_interval=2)
    tr.init_table(T, is_snapshot=False, user_id="u")
    for k in range(6):
        _commit(tr, f"2024-01-{k:02d}")
    d = tr._table_dir(T)
    ptr = json.loads(fs.read_text(fs.join(d, "_last_checkpoint")))
    assert fs.exists(fs.join(d, f"checkpoint_{ptr['seq']:013d}.json"))
    # a straggler re-writing an OLD pointer is skipped
    old = json.dumps({"seq": ptr["seq"] - 2})
    # (simulate by direct call: _maybe_checkpoint would recompute; here we
    # just verify the guard path via the pointer contents staying put)
    cur_before = fs.read_text(fs.join(d, "_last_checkpoint"))
    tr._maybe_checkpoint(d)  # no new interval elapsed -> no change
    assert fs.read_text(fs.join(d, "_last_checkpoint")) == cur_before
    # resolution still agrees with the full fold
    truth = FileBackedVersionTracker("root", fs=MemoryFileSystem("tok3"),
                                     checkpoint_interval=None)
    assert tr.current_version(T) == truth.current_version(T)


def test_fsspec_wrapper_maps_backend_precondition_errors():
    """s3fs/gcsfs surface HTTP 412 precondition failures as backend-specific
    exceptions at close() time, not FileExistsError — the wrapper must
    treat them as a lost CAS race when the object now exists, and
    propagate anything else."""
    import io

    from chronicles_spark.trackers.fs import FsspecFileSystem

    class Backend412Error(Exception):
        pass

    class FakeFsspec:
        def __init__(self):
            self.objects = {}
            self.fail_with_412 = set()

        def exists(self, path):
            return path in self.objects

        def open(self, path, mode="r"):
            fs = self
            if "r" in mode and "x" not in mode:  # read-back path
                class _R(io.StringIO):
                    def __init__(self):
                        super().__init__(fs.objects[path])

                    def __exit__(self, *a):
                        return False

                return _R()

            class _W(io.StringIO):
                def __exit__(self, *a):
                    if path in fs.fail_with_412:
                        fs.objects[path] = "<winner>"  # the racer's object
                        raise Backend412Error("412 PreconditionFailed")
                    if "x" in mode and path in fs.objects:
                        raise FileExistsError(path)
                    fs.objects[path] = self.getvalue()
                    return False

            return _W()

    fake = FakeFsspec()
    fs = FsspecFileSystem(fake, conditional_put=True)
    assert fs.supports_put_if_absent()
    # clean create
    assert fs.write_text_if_absent("b/one", "v") is True
    # plain FileExistsError → lost race
    assert fs.write_text_if_absent("b/one", "v2") is False
    # backend-specific 412 where ANOTHER writer's object landed → lost race
    fake.fail_with_412.add("b/two")
    assert fs.write_text_if_absent("b/two", "v") is False
    # client error after OUR OWN put succeeded server-side (read-back
    # matches our bytes) → the write counts, no duplicate commit retry
    class FakeOwnPutLostAck(FakeFsspec):
        def open(self, path, mode="r"):
            import io as _io
            fsel = self
            if "x" in mode:
                class _W(_io.StringIO):
                    def __exit__(self, *a):
                        fsel.objects[path] = self.getvalue()  # landed
                        raise Backend412Error("response lost")
                return _W()
            class _R(_io.StringIO):
                def __init__(self):
                    super().__init__(fsel.objects[path])
                def __exit__(self, *a):
                    return False
            return _R()

    fs_own = FsspecFileSystem(FakeOwnPutLostAck(), conditional_put=True)
    assert fs_own.write_text_if_absent("b/own", "mine") is True
    # backend error with NO object present → real failure, propagates
    class FakeBroken(FakeFsspec):
        def open(self, path, mode="r"):
            raise Backend412Error("network down")

    fs2 = FsspecFileSystem(FakeBroken(), conditional_put=True)
    with pytest.raises(Backend412Error, match="network down"):
        fs2.write_text_if_absent("b/three", "v")
    # without the opt-in, the capability is refused up front
    fs3 = FsspecFileSystem(FakeFsspec())
    assert not fs3.supports_put_if_absent()
    with pytest.raises(NotImplementedError):
        fs3.write_text_if_absent("b/x", "v")


def test_checkpoint_covering_inflight_commit_degrades_to_full_fold():
    """CAS scenario: writer B's commit FILE has landed but B has not yet
    advanced the head (in-flight) when writer A checkpoints — the
    checkpoint's prefix then includes a commit ahead of the head.
    Resolution at the current head must fall back to the full fold and
    agree with a ground-truth tracker, not resolve through a checkpoint
    that is 'from the future'."""
    from chronicles_spark.core.ops import update_to_json

    fs = MemoryFileSystem("inflight")
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True, checkpoint_interval=2)
    tr.init_table(T, is_snapshot=False, user_id="u")
    c1 = _commit(tr, "2024-01-01")
    d = tr._table_dir(T)

    # writer B: commit file lands (next seq slot) but head is NOT advanced
    seqs = sorted(
        int(n[len("table_update_"):-len(".json")])
        for n in fs.list_dir(d) if n.startswith("table_update_")
    )
    inflight = TableUpdate(
        TableUpdateMetadata.new("B", "in-flight"),
        (AddPartitionVersion(Partition.of(("d", "9999-01-01")), generate_version()),),
    )
    assert fs.write_text_if_absent(
        fs.join(d, f"table_update_{seqs[-1] + 1:013d}.json"),
        update_to_json(inflight),
    )

    # writer A checkpoints NOW: the fold prefix includes B's in-flight file
    tr._maybe_checkpoint(d)
    assert any(n.startswith("checkpoint_") for n in fs.list_dir(d))

    # resolution at the CURRENT head must not see B's partition
    truth = FileBackedVersionTracker(
        "root", fs=MemoryFileSystem("inflight"), checkpoint_interval=None
    )
    got = tr.current_version(T)
    assert got == truth.current_version(T)
    assert Partition.of(("d", "9999-01-01")) not in got.partition_versions
    assert tr.table_state(T).current_version == c1

    # once B's head advance arrives, the commit becomes visible everywhere
    tr._advance_head(d, inflight.metadata.commit_id, seqs[-1] + 1)
    got2 = tr.current_version(T)
    assert Partition.of(("d", "9999-01-01")) in got2.partition_versions
    assert got2 == truth.current_version(T)


def test_local_fs_token_cas_thread_race(tmp_path):
    """Many threads CAS the same local file concurrently: every successful
    swap must have observed the then-current content (no lost updates),
    so a counter incremented via read-token → write-if-match reaches
    exactly the number of successful swaps."""
    import threading

    from chronicles_spark.trackers.fs import LocalFileSystem

    fs = LocalFileSystem()
    p = str(tmp_path / "counter")
    fs.write_text(p, "0")
    n_threads, per_thread = 8, 25
    wins = []

    def work():
        w = 0
        for _ in range(per_thread):
            for _ in range(200):  # retry loop per increment
                text, tok = fs.read_text_and_token(p)
                if fs.write_text_if_match(p, str(int(text) + 1), tok):
                    w += 1
                    break
            else:  # pragma: no cover
                raise AssertionError("CAS starved")
        wins.append(w)

    ts = [threading.Thread(target=work) for _ in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sum(wins) == n_threads * per_thread
    assert fs.read_text(p) == str(n_threads * per_thread)


def test_gap_filled_commit_below_checkpoint_degrades_to_full_fold():
    """Two CAS writers with skewed per-process clocks: writer A's commit
    lands at a sequence BELOW a checkpoint writer B already cut (A's slot
    was still free at cut time).  Every checkpointed reader must detect
    the gap-fill (n_folded prefix count) and fall back to the full fold —
    without the guard, A's committed partition would silently never
    appear through the fast path."""
    from chronicles_spark.core.ops import update_to_json

    fs = MemoryFileSystem("gapfill")
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True, checkpoint_interval=2)
    tr.init_table(T, is_snapshot=False, user_id="u")
    # writer B: enough commits to cut a checkpoint
    for k in range(4):
        _commit(tr, f"2024-01-{k:02d}")
    d = tr._table_dir(T)
    ck_names = [n for n in fs.list_dir(d) if n.startswith("checkpoint_")]
    assert ck_names, "precondition: a checkpoint exists"
    last_ck_seq = max(int(n[len("checkpoint_"):-len(".json")]) for n in ck_names)

    # writer A (slow clock): claims a still-free slot BELOW the checkpoint
    seqs = sorted(
        int(n[len("table_update_"):-len(".json")])
        for n in fs.list_dir(d) if n.startswith("table_update_")
    )
    gap_seq = seqs[0] - 5  # definitely below the checkpoint and free
    assert gap_seq < last_ck_seq
    gap = TableUpdate(
        TableUpdateMetadata.new("A", "slow-clock gap fill"),
        (AddPartitionVersion(Partition.of(("d", "gap")), generate_version()),),
    )
    assert fs.write_text_if_absent(
        fs.join(d, f"table_update_{gap_seq:013d}.json"), update_to_json(gap)
    )
    # A's head advance: head seq is larger → monotonic skip (as designed)
    tr._advance_head(d, gap.metadata.commit_id, gap_seq)

    truth = FileBackedVersionTracker(
        "root", fs=MemoryFileSystem("gapfill"), checkpoint_interval=None
    )
    got = tr.current_version(T)
    assert got == truth.current_version(T), (
        "checkpointed resolution diverged from the full fold after a "
        "gap-filled commit"
    )
    assert Partition.of(("d", "gap")) in got.partition_versions

    # the NEXT checkpoint rebuild folds the gap back in and the fast path
    # becomes usable again
    for k in range(3):
        _commit(tr, f"2024-02-{k:02d}")
    got2 = tr.current_version(T)
    assert got2 == truth.current_version(T)
    assert Partition.of(("d", "gap")) in got2.partition_versions


def test_fsspec_indeterminate_readback_surfaces_original_error():
    """Put fails ambiguously AND the disambiguating read fails: the
    original put error must propagate (never a silent duplicate-retry or
    slot-steal guess)."""
    import io

    from chronicles_spark.trackers.fs import FsspecFileSystem

    class PutErr(Exception):
        pass

    class ReadErr(Exception):
        pass

    class FakeIndeterminate:
        def exists(self, path):
            return True  # object present, provenance unknown

        def open(self, path, mode="r"):
            if "r" in mode and "x" not in mode:
                raise ReadErr("throttled")

            class _W(io.StringIO):
                def __exit__(self, *a):
                    raise PutErr("response lost")

            return _W()

    fs = FsspecFileSystem(FakeIndeterminate(), conditional_put=True)
    with pytest.raises(PutErr, match="response lost"):
        fs.write_text_if_absent("b/x", "v")


def test_gap_fill_self_heal_replaces_stale_same_seq_checkpoint():
    """After a gap-fill, a rebuild that lands on the SAME last_seq must
    replace the stale checkpoint file (strictly higher n_folded), so the
    fast path recovers without waiting for an unrelated future commit."""
    import json as _json

    from chronicles_spark.core.ops import update_to_json

    fs = MemoryFileSystem("gapheal")
    # interval=1: the newest checkpoint sits at the NEWEST commit file's
    # sequence, so the post-gap rebuild targets the SAME name (the heal
    # branch; a rebuild at a higher seq is the ordinary new-file path)
    tr = FileBackedVersionTracker("root", fs=fs, use_cas=True, checkpoint_interval=1)
    tr.init_table(T, is_snapshot=False, user_id="u")
    for k in range(4):
        _commit(tr, f"2024-01-{k:02d}")
    d = tr._table_dir(T)
    ptr = _json.loads(fs.read_text(fs.join(d, "_last_checkpoint")))
    ck_path = fs.join(d, f"checkpoint_{ptr['seq']:013d}.json")
    n_before = _json.loads(fs.read_text(ck_path))["n_folded"]

    # gap-fill below the checkpoint
    seqs = sorted(
        int(n[len("table_update_"):-len(".json")])
        for n in fs.list_dir(d) if n.startswith("table_update_")
    )
    gap = TableUpdate(
        TableUpdateMetadata.new("A", "gap"),
        (AddPartitionVersion(Partition.of(("d", "healme")), generate_version()),),
    )
    assert fs.write_text_if_absent(
        fs.join(d, f"table_update_{seqs[0] - 3:013d}.json"), update_to_json(gap)
    )

    # a direct checkpoint attempt rebuilds at the SAME last_seq and heals
    tr._maybe_checkpoint(d)
    healed = _json.loads(fs.read_text(ck_path))
    assert healed["n_folded"] == n_before + 1
    # the fast path is usable again immediately (no new commits needed)
    assert tr._fast_resolve(d, tr._read_head(d)) is not None
    truth = FileBackedVersionTracker(
        "root", fs=MemoryFileSystem("gapheal"), checkpoint_interval=None
    )
    assert tr.current_version(T) == truth.current_version(T)
    assert Partition.of(("d", "healme")) in tr.current_version(T).partition_versions


def test_boto_412_then_vanished_object_reports_slot_free():
    """BotoS3FileSystem conditional put: a 412 whose object has VANISHED
    by the time we read it back (the racer's commit was itself rolled
    back / deleted) means the slot is free again — the CAS loop must see
    False and retry, not have read_text's FileNotFoundError translation
    escape through the retry loop."""
    import botocore.exceptions as be

    from chronicles_spark.trackers.fs import BotoS3FileSystem

    class FakeS3:
        def put_object(self, Bucket, Key, Body, IfNoneMatch=None):
            assert IfNoneMatch == "*"
            raise be.ClientError(
                {"Error": {"Code": "PreconditionFailed"}}, "PutObject"
            )

        def get_object(self, Bucket, Key):
            raise be.ClientError({"Error": {"Code": "NoSuchKey"}}, "GetObject")

    fs = BotoS3FileSystem(client=FakeS3())
    assert fs.write_text_if_absent("s3://b/slot", "v") is False
