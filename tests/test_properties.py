"""Property-based tests (hypothesis ≙ the reference's ScalaCheck layer:
ModelSpec.scala:32-65, VersionSpec.scala:55-60, VersionPathsSpec.scala,
VersionTrackerObjectSpec.scala:18-89)."""

import uuid as _uuid
from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from chronicles_spark.core import paths as vp
from chronicles_spark.core.fold import apply_partition_updates
from chronicles_spark.core.model import Partition, TableName
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    RemovePartition,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import (
    UNVERSIONED,
    Version,
    generate_version,
    make_label,
    parse_version,
)

# ---------------------------------------------------------------------------
# generators

_keys = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
# partition VALUES are raw strings; parse splits fragments on '/' and the
# colval regex uses '.' (no newlines). Everything else must round-trip.
_values = st.text(min_size=1, max_size=20).filter(
    lambda s: "/" not in s and "\n" not in s and "\r" not in s
)
_partitions = st.lists(
    st.tuples(_keys, _values), min_size=1, max_size=3, unique_by=lambda kv: kv[0]
).map(lambda kvs: Partition(tuple(kvs)))

_timestamps = st.datetimes(
    min_value=datetime(1970, 1, 2), max_value=datetime(2200, 1, 1)
)
_uuids = st.uuids(version=4)


@st.composite
def _versions(draw):
    ts = draw(_timestamps).replace(microsecond=0)
    nanos = draw(st.integers(0, 999_999_999))
    return Version(make_label(ts, nanos, draw(_uuids)))


# ---------------------------------------------------------------------------
# round-trips


@given(_partitions)
def test_partition_path_roundtrip(p):
    assert Partition.parse(p.path) == p


@given(st.text(max_size=30))
def test_escape_unescape_roundtrip(value):
    assert vp.unescape_path_name(vp.escape_path_name(value)) == value


@given(st.text(min_size=1, max_size=30).filter(lambda s: "\n" not in s and "\r" not in s))
def test_escaped_fragment_is_path_safe(value):
    frag = vp.escape_path_name(value)
    assert "/" not in frag and "=" not in frag and ":" not in frag


@given(_versions())
def test_version_label_roundtrip(v):
    assert parse_version(v.label) == v


@given(_versions(), st.from_regex(r"(s3:/|)(/[a-z0-9_\-]{1,8}){1,4}", fullmatch=True))
def test_version_paths_roundtrip(v, base):
    path = vp.path_for(base, v)
    assert vp.parse_version(path) == v
    assert vp.versioned_to_base_path(path) == base.rstrip("/")


@given(st.from_regex(r"(/[a-z0-9_\-]{1,8}){1,4}", fullmatch=True))
def test_unversioned_path_is_identity(base):
    assert vp.path_for(base, UNVERSIONED) == base
    assert vp.parse_version(base) == UNVERSIONED


@given(st.from_regex(r"[\w\-]{1,10}\.[\w\-]{1,10}", fullmatch=True))
def test_table_name_roundtrip(s):
    assert TableName.parse(s).fully_qualified == s


# ---------------------------------------------------------------------------
# fold algebra vs naive replay


@st.composite
def _op_sequences(draw):
    parts = draw(
        st.lists(_partitions, min_size=1, max_size=4, unique_by=lambda p: p.path)
    )
    ops = draw(
        st.lists(
            st.tuples(st.sampled_from(parts), st.booleans()),  # (partition, is_add)
            min_size=0,
            max_size=20,
        )
    )
    return ops


@given(_op_sequences())
@settings(max_examples=200, deadline=None)
def test_fold_equals_naive_replay(op_seq):
    updates = []
    expected = {}
    for i, (part, is_add) in enumerate(op_seq):
        if is_add:
            v = generate_version(datetime(2020, 1, 1, tzinfo=timezone.utc))
            op = AddPartitionVersion(part, v)
            expected[part] = v
        else:
            op = RemovePartition(part)
            expected.pop(part, None)
        meta = TableUpdateMetadata(
            str(_uuid.uuid4()), "u", f"c{i}", datetime(2020, 1, 1, tzinfo=timezone.utc)
        )
        updates.append(TableUpdate(meta, (op,)))
    folded = apply_partition_updates(updates)
    assert folded.partition_versions == expected
