"""Persisted versions index (spark/version_index.py): the sweeps'
O(tail) Add-ops enumeration.  House-style differential: the indexed
enumeration must equal the full walk under every log shape that has
bitten something before — branches, rollbacks, tail growth, warm
re-reads, drop+recreate under the same name, and a CAS gap-filling
commit landing BELOW an already-indexed position."""

import json
import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.core.model import (
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.ops import (
    AddPartitionVersion,
    TableUpdate,
    TableUpdateMetadata,
)
from chronicles_spark.core.version import generate_version
from chronicles_spark.spark.vacuum import _versions_ever_written, vacuum
from chronicles_spark.spark.version_index import (
    INDEX_DIR,
    INDEX_FILE,
    MANIFEST_FILE,
    line_versions_indexed,
)
from chronicles_spark.trackers import FileBackedVersionTracker
from chronicles_spark.trackers.memory import InMemoryVersionTracker

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _commit(tracker, name, part_val):
    from datetime import datetime, timezone

    tracker.commit(
        name,
        TableUpdate(
            TableUpdateMetadata.new("t", "x", datetime.now(timezone.utc)),
            (AddPartitionVersion(
                Partition.of(("p", part_val)), generate_version()
            ),),
        ),
    )


def _mk(tmp_path, n_commits=120, checkpoint_interval=25):
    tracker = FileBackedVersionTracker(
        str(tmp_path / "_log"), checkpoint_interval=checkpoint_interval
    )
    table = TableDefinition(
        TableName("demo", "vx"), str(tmp_path / "vx"), PartitionSchema(("p",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    for i in range(n_commits):
        _commit(tracker, table.name, str(i % 7))
    return table, tracker


def test_indexed_enumeration_equals_full_walk(tmp_path):
    table, tracker = _mk(tmp_path)
    walk = _versions_ever_written(tracker, table, use_index=False)
    idx = _versions_ever_written(tracker, table, use_index=True)
    assert idx == walk and len(idx) == 120
    # warm re-read (index now on disk) still equal
    assert os.path.exists(str(tmp_path / "vx" / INDEX_DIR / MANIFEST_FILE))
    assert _versions_ever_written(tracker, table, use_index=True) == walk

    # tail growth: new commits after the index was cut are picked up
    for i in range(9):
        _commit(tracker, table.name, "99")
    walk2 = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk2
    assert len(walk2) == 129

    # a rollback moves the head but never removes commits — enumeration
    # (and therefore the index) is unaffected
    updates = tracker.table_state(table.name).updates
    tracker.set_current_version(table.name, updates[5].metadata.commit_id)
    assert _versions_ever_written(tracker, table, use_index=True) == walk2


def test_indexed_enumeration_covers_branches_and_drops_them(tmp_path):
    from chronicles_spark.branching import branch_table_name, create_branch

    table, tracker = _mk(tmp_path, n_commits=10)
    create_branch(tracker, table.name, "dev", user_id="t")
    bname = branch_table_name(table.name, "dev")
    for i in range(5):
        _commit(tracker, bname, f"b{i}")
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    # branch-only labels are present
    assert any(p is not None and p.path == "p=b3" for p, _v in walk)

    # a DROPPED branch disappears from both enumerations identically
    from chronicles_spark.branching import delete_branch

    delete_branch(tracker, table.name, "dev")
    walk2 = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk2
    assert not any(p is not None and p.path == "p=b3" for p, _v in walk2)


def test_index_detects_drop_and_recreate(tmp_path):
    table, tracker = _mk(tmp_path, n_commits=8)
    _versions_ever_written(tracker, table, use_index=True)  # cut the index
    tracker.drop_table(table.name)
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    for i in range(3):
        _commit(tracker, table.name, f"new{i}")
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert len(walk) == 3
    # first-commit-id mismatch forces a rebuild — never stale entries
    assert _versions_ever_written(tracker, table, use_index=True) == walk


def test_index_detects_cas_gap_shift(tmp_path):
    """A CAS writer whose clock ran behind can land a commit file BELOW
    an already-indexed position; the stored last-position commit id no
    longer matches and the line rebuilds from scratch."""
    from chronicles_spark.core.ops import update_to_json

    table, tracker = _mk(tmp_path, n_commits=12)
    _versions_ever_written(tracker, table, use_index=True)  # cut the index
    # hand-craft a commit file sorting BELOW every existing one
    from datetime import datetime, timezone

    gap = TableUpdate(
        TableUpdateMetadata.new("ghost", "gap", datetime.now(timezone.utc)),
        (AddPartitionVersion(Partition.of(("p", "gap")), generate_version()),),
    )
    d = tracker._table_dir(table.name)
    tracker.fs.write_text(
        tracker.fs.join(d, "table_update_0000000000001.json"),
        update_to_json(gap),
    )
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert any(p is not None and p.path == "p=gap" for p, _v in walk)
    assert _versions_ever_written(tracker, table, use_index=True) == walk


def test_corrupt_index_degrades_to_walk(tmp_path):
    table, tracker = _mk(tmp_path, n_commits=6)
    walk = _versions_ever_written(tracker, table, use_index=False)
    _versions_ever_written(tracker, table, use_index=True)
    idx_path = str(tmp_path / "vx" / INDEX_DIR / MANIFEST_FILE)
    with open(idx_path, "w") as f:
        f.write("{not json")
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    # ...and the sweep healed the file
    json.load(open(idx_path))


def test_tracker_without_tail_surface_falls_back(tmp_path):
    tracker = InMemoryVersionTracker()
    table = TableDefinition(
        TableName("demo", "vm"), str(tmp_path / "vm"), PartitionSchema(("p",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    for i in range(4):
        _commit(tracker, table.name, str(i))
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    assert not os.path.exists(str(tmp_path / "vm" / INDEX_DIR))
    assert not os.path.exists(str(tmp_path / "vm" / INDEX_FILE))


def test_vacuum_decisions_identical_with_and_without_index(spark, tmp_path):
    """The real sweep: doomed sets from the indexed and walking paths are
    identical on a churned versioned table (overwrites + rollback), and
    vacuum_ann_artifacts agrees with itself across the toggle too."""
    from chronicles_spark.operators import ann_index as AX
    from chronicles_spark.sources import load_table
    from chronicles_spark.spark import versioned_insert_into

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tracker = FileBackedVersionTracker(str(tmp_path / "_vlog"))
    table = TableDefinition(
        TableName("demo", "vev"), str(tmp_path / "vev"),
        PartitionSchema(("event_date",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    events = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    versioned_insert_into(events, table, tracker, "t", "v1")
    one_day = events.where(F.col("event_date") == events.agg(
        F.min("event_date")
    ).collect()[0][0])
    versioned_insert_into(one_day, table, tracker, "t", "v2")
    versioned_insert_into(one_day, table, tracker, "t", "v3")

    doomed_walk = sorted(
        vacuum(table, tracker, keep_last=1, dry_run=True, version_index=False)
    )
    doomed_idx = sorted(
        vacuum(table, tracker, keep_last=1, dry_run=True, version_index=True)
    )
    assert doomed_idx == doomed_walk and doomed_walk

    # ann sidecar sweep equivalence on a rebuilt index (superseded label)
    atracker = FileBackedVersionTracker(str(tmp_path / "_alog"))
    atable = TableDefinition(
        TableName("demo", "vann"), str(tmp_path / "vann"),
        PartitionSchema(("bucket",)),
    )
    atracker.init_table(atable.name, is_snapshot=False, user_id="t")
    emb = load_table(spark, SF_DIR, "embeddings")
    AX.build_ann_index(emb, atable, atracker, n_clusters=4, m=4, k_sub=4, iters=0)
    AX.build_ann_index(emb, atable, atracker, n_clusters=4, m=4, k_sub=4, iters=0)
    vacuum(atable, atracker, keep_last=1)  # reclaim superseded bucket dirs
    a_walk = sorted(AX.vacuum_ann_artifacts(
        atable, atracker, dry_run=True, version_index=False
    ))
    a_idx = sorted(AX.vacuum_ann_artifacts(
        atable, atracker, dry_run=True, version_index=True
    ))
    assert a_idx == a_walk and a_walk  # the superseded label's sidecar


def _seg_files(tmp_path):
    d = str(tmp_path / "vx" / INDEX_DIR)
    return sorted(
        f for f in os.listdir(d) if f.startswith("seg-") and f.endswith(".json")
    )


def test_sweep_writes_only_the_tail_segment(tmp_path):
    """Round-8 artifact-cost contract: after the index is cut, a sweep
    over K new commits writes ONE new segment holding exactly K entries
    — the history segment is byte-untouched (same file, same mtime,
    same bytes), and the manifest stays small."""
    table, tracker = _mk(tmp_path, n_commits=100)
    _versions_ever_written(tracker, table, use_index=True)  # cut
    segs0 = _seg_files(tmp_path)
    assert len(segs0) == 1
    d = str(tmp_path / "vx" / INDEX_DIR)
    big = os.path.join(d, segs0[0])
    bytes0 = open(big, "rb").read()
    mtime0 = os.path.getmtime(big)

    for i in range(3):
        _commit(tracker, table.name, f"t{i}")
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk

    segs1 = _seg_files(tmp_path)
    assert segs0[0] in segs1 and len(segs1) == 2
    assert open(big, "rb").read() == bytes0
    assert os.path.getmtime(big) == mtime0
    new = [f for f in segs1 if f != segs0[0]][0]
    tail_doc = json.load(open(os.path.join(d, new)))
    assert len(tail_doc["entries"]) == 3
    # ...and the tail segment's bytes are a tiny fraction of the history's
    assert os.path.getsize(os.path.join(d, new)) < len(bytes0) / 10

    # a sweep with NO new commits writes no new segment
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    assert _seg_files(tmp_path) == segs1


def test_legacy_blob_migrates_to_segments(tmp_path):
    """A pre-segmentation cumulative blob is read once (prefix reused —
    no full-log re-walk), rewritten as segments, and removed."""
    from chronicles_spark.spark import version_index as VX

    table, tracker = _mk(tmp_path, n_commits=30)
    # hand-write the LEGACY single-blob layout the old code produced
    walk = _versions_ever_written(tracker, table, use_index=False)
    updates = tracker.table_state(table.name).updates
    legacy = {
        str(table.name): {
            "upto": tracker.update_count(table.name),
            "first_commit_id": updates[0].metadata.commit_id,
            "last_commit_id": updates[-1].metadata.commit_id,
            "entries": [
                [p.path if p is not None else None, v.label] for p, v in walk
            ],
        }
    }
    os.makedirs(str(tmp_path / "vx"), exist_ok=True)
    with open(str(tmp_path / "vx" / INDEX_FILE), "w") as f:
        json.dump({"lines": legacy}, f)

    for i in range(2):
        _commit(tracker, table.name, f"m{i}")
    walk2 = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk2
    # migrated: blob gone, segmented layout present (prefix + tail)
    assert not os.path.exists(str(tmp_path / "vx" / INDEX_FILE))
    assert len(_seg_files(tmp_path)) == 2
    assert _versions_ever_written(tracker, table, use_index=True) == walk2


def test_corrupt_segment_rebuilds_line(tmp_path):
    table, tracker = _mk(tmp_path, n_commits=12)
    walk = _versions_ever_written(tracker, table, use_index=False)
    _versions_ever_written(tracker, table, use_index=True)
    d = str(tmp_path / "vx" / INDEX_DIR)
    seg = _seg_files(tmp_path)[0]
    with open(os.path.join(d, seg), "w") as f:
        f.write("{broken")
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    # healed: the corrupt segment was superseded (the fresh file itself
    # rides out the reclaim grace window — it could as well be a racing
    # sweep's — and is swept once aged)
    import json as _json
    import time as _time

    from chronicles_spark.spark import version_index as VX

    with open(os.path.join(d, VX.MANIFEST_FILE)) as f:
        referenced = {
            s["file"]
            for line in _json.load(f)["lines"].values()
            for s in line["segments"]
        }
    assert seg not in referenced and len(referenced) == 1
    old = _time.time() - VX.ORPHAN_SEGMENT_GRACE_SECONDS - 60
    os.utime(os.path.join(d, seg), (old, old))
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    segs = _seg_files(tmp_path)
    assert seg not in segs and len(segs) == 1


def test_segments_compact_and_orphans_reclaimed(tmp_path):
    from chronicles_spark.spark import version_index as VX

    table, tracker = _mk(tmp_path, n_commits=5)
    _versions_ever_written(tracker, table, use_index=True)
    # drive many tail sweeps to cross the compaction threshold
    for i in range(VX.MAX_SEGMENTS_PER_LINE + 2):
        _commit(tracker, table.name, f"c{i}")
        _versions_ever_written(tracker, table, use_index=True)

    # compaction bounds the REFERENCED set — what a sweep actually GETs;
    # files it superseded ride out the reclaim grace window first
    import time

    def referenced():
        with open(os.path.join(str(tmp_path / "vx" / INDEX_DIR),
                               VX.MANIFEST_FILE)) as f:
            return {
                s["file"]
                for line in json.load(f)["lines"].values()
                for s in line["segments"]
            }

    refs = referenced()
    assert len(refs) <= VX.MAX_SEGMENTS_PER_LINE
    walk = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk

    # age the superseded files past the grace window → the next sweep
    # reclaims disk down to exactly the referenced set
    old_ts = time.time() - VX.ORPHAN_SEGMENT_GRACE_SECONDS - 60
    for name in _seg_files(tmp_path):
        if name not in refs:
            p = os.path.join(str(tmp_path / "vx" / INDEX_DIR), name)
            os.utime(p, (old_ts, old_ts))
    assert _versions_ever_written(tracker, table, use_index=True) == walk
    assert set(_seg_files(tmp_path)) == referenced()

    # a FRESH unreferenced segment is protected by the grace window — it
    # may be a CONCURRENT sweep's segment whose manifest hasn't landed
    # yet (ADVICE r8: racing sweeps must not delete each other's
    # just-written segments and thrash the index)
    import time

    d = str(tmp_path / "vx" / INDEX_DIR)
    orphan = os.path.join(d, "seg-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump({"entries": []}, f)
    _commit(tracker, table.name, "after-orphan")
    walk2 = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk2
    assert os.path.exists(orphan)  # too young to be a crash orphan

    # once AGED past the grace window (a genuinely crashed sweep), the
    # next sweep reclaims it
    old = time.time() - VX.ORPHAN_SEGMENT_GRACE_SECONDS - 60
    os.utime(orphan, (old, old))
    _commit(tracker, table.name, "after-aged-orphan")
    walk3 = _versions_ever_written(tracker, table, use_index=False)
    assert _versions_ever_written(tracker, table, use_index=True) == walk3
    assert not os.path.exists(orphan)
