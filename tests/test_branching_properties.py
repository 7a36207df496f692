"""Property-based differential test of the branch merge/rebase algebra.

A pure-python MODEL computes the expected three-way outcome from the
(base, branch, main) states; the REAL implementation runs the same random
op sequences through an InMemoryVersionTracker.  Hypothesis shrinks any
divergence to a minimal op sequence — the house differential style
(numpy k-means, union-find, Counter) applied to the merge semantics.
"""

from hypothesis import given, settings, strategies as st

from chronicles_spark import branching as B
from chronicles_spark.core.model import (
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    RemovePartition,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.trackers import InMemoryVersionTracker

T = TableName("db", "events")
KEYS = [f"date=2024-01-{i:02d}" for i in range(1, 6)]

# an op: (key_index, version_index or None-for-remove); version_index
# picks from a shared pool so "both sides made the identical change" is
# generable
_op = st.tuples(st.integers(0, len(KEYS) - 1), st.one_of(st.none(), st.integers(0, 7)))
_ops = st.lists(_op, max_size=6)


def _apply_model(state: dict, ops, pool) -> dict:
    out = dict(state)
    for k_i, v_i in ops:
        if v_i is None:
            out.pop(KEYS[k_i], None)
        else:
            out[KEYS[k_i]] = pool[v_i]
    return out


def _commit_ops(tracker, name, ops, pool):
    if not ops:
        return
    real_ops = []
    for k_i, v_i in ops:
        p = Partition.parse(KEYS[k_i])
        if v_i is None:
            real_ops.append(RemovePartition(p))
        else:
            real_ops.append(AddPartitionVersion(p, pool[v_i]))
    meta = TableUpdateMetadata.new("u", "ops")
    tracker.commit(name, TableUpdate(meta, tuple(real_ops)))


def _expected_merge(base, br, main):
    """Model: for each key, branch-changed keys need main == base (or main
    already == branch) else conflict; unchanged keys keep main."""
    out = dict(main)
    conflicts = []
    for k in set(base) | set(br):
        b0, b1 = base.get(k), br.get(k)
        if b0 == b1:
            continue
        m = main.get(k)
        if m == b1:
            continue
        if m != b0:
            conflicts.append(k)
        elif b1 is None:
            out.pop(k, None)
        else:
            out[k] = b1
    return out, sorted(conflicts)


@settings(max_examples=300, deadline=None)
@given(base_ops=_ops, branch_ops=_ops, main_ops=_ops, data=st.data())
def test_merge_matches_three_way_model(base_ops, branch_ops, main_ops, data):
    pool = [generate_version() for _ in range(8)]
    tracker = InMemoryVersionTracker()
    tracker.init_table(T, is_snapshot=False, user_id="u")
    table = TableDefinition(T, "", PartitionSchema(("date",)))

    _commit_ops(tracker, T, base_ops, pool)
    base = {
        p.path: v
        for p, v in tracker.current_version(T).partition_versions.items()
    }
    B.create_branch(tracker, T, "s", "u")
    btn = B.branch_table_name(T, "s")
    _commit_ops(tracker, btn, branch_ops, pool)
    _commit_ops(tracker, T, main_ops, pool)

    br = {
        p.path: v
        for p, v in tracker.current_version(btn).partition_versions.items()
    }
    main = {
        p.path: v
        for p, v in tracker.current_version(T).partition_versions.items()
    }
    want, want_conflicts = _expected_merge(base, br, main)

    if want_conflicts:
        try:
            B.merge_branch(table, tracker, "s", "u", "publish")
            raise AssertionError(f"expected conflicts {want_conflicts}")
        except B.MergeConflictError as e:
            assert sorted(e.partitions) == want_conflicts
        # main untouched by the failed merge
        got = {
            p.path: v
            for p, v in tracker.current_version(T).partition_versions.items()
        }
        assert got == main
        # 'theirs' overrides contested keys with the branch side
        state, _ = B.merge_branch(
            table, tracker, "s", "u", "force", on_conflict="theirs"
        )
        got = {p.path: v for p, v in state.partition_versions.items()}
        theirs = dict(want)
        for k in want_conflicts:
            if br.get(k) is None:
                theirs.pop(k, None)
            else:
                theirs[k] = br[k]
        assert got == theirs
    else:
        state, _ = B.merge_branch(table, tracker, "s", "u", "publish")
        got = {p.path: v for p, v in state.partition_versions.items()}
        assert got == want


@settings(max_examples=150, deadline=None)
@given(base_ops=_ops, branch_ops=_ops, main_ops=_ops)
def test_rebase_then_merge_reaches_model_state(base_ops, branch_ops, main_ops):
    """rebase(on_conflict='theirs') then merge must land exactly: main's
    state overlaid with every branch change-since-base (branch wins on
    contested keys)."""
    pool = [generate_version() for _ in range(8)]
    tracker = InMemoryVersionTracker()
    tracker.init_table(T, is_snapshot=False, user_id="u")
    table = TableDefinition(T, "", PartitionSchema(("date",)))

    _commit_ops(tracker, T, base_ops, pool)
    base = {
        p.path: v
        for p, v in tracker.current_version(T).partition_versions.items()
    }
    B.create_branch(tracker, T, "s", "u")
    btn = B.branch_table_name(T, "s")
    _commit_ops(tracker, btn, branch_ops, pool)
    _commit_ops(tracker, T, main_ops, pool)
    br = {
        p.path: v
        for p, v in tracker.current_version(btn).partition_versions.items()
    }
    main = {
        p.path: v
        for p, v in tracker.current_version(T).partition_versions.items()
    }

    expected = dict(main)
    for k in set(base) | set(br):
        b0, b1 = base.get(k), br.get(k)
        if b0 == b1:
            continue
        if b1 is None:
            expected.pop(k, None)
        else:
            expected[k] = b1

    B.rebase_branch(table, tracker, "s", "u", on_conflict="theirs")
    state, _ = B.merge_branch(table, tracker, "s", "u", "publish")
    got = {p.path: v for p, v in state.partition_versions.items()}
    assert got == expected
