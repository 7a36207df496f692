"""Two-OS-PROCESS dedup-index extend race: each worker runs its own
Spark session and upserts a disjoint doc-id set into ONE shared index
with ``use_lock=True`` and ``exclusive=True`` — the per-table flock
held across each whole read-modify-write, so extends serialize cleanly
(no Spark output-committer staging clash, no conflicts to retry), with
the exactly-once pairs journal riding each group commit.

Pinned guarantee: however the extends interleave, NO row is ever lost —
the final band table equals a from-scratch build of the union corpus
under the same geometry, the doc store holds every worker's every id,
the offline verify is empty, and the pairs journal stays PAIRED with
the index (the next extend neither refuses nor repairs).  (The
in-process monkeypatch race in test_dedup_index.py pins the
conflict/auto-merge SEMANTICS; this pins the end-to-end OUTCOME across
real processes and real flock serialization — the ANN family's
test_ann_index_multiprocess contract, dedup flavor.)
"""

import pytest
import os
import subprocess
import sys

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import dedup_index as DX
from chronicles_spark.trackers import FileBackedVersionTracker

# slow tier: real OS-process extend race (run via -m "slow or not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _text(doc_id: int) -> str:
    return " ".join(
        f"w{(doc_id * (7 + 13 * j) + j * j) % 97}" for j in range(20)
    )


_WORKER = """
import json, sys
from pyspark.sql import SparkSession
from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import dedup_index as DX
from chronicles_spark.trackers import FileBackedVersionTracker

import pytest


root, loc, wid = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[2]")
         .appName(f"dedup-race-{wid}")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tracker = FileBackedVersionTracker(root, use_lock=True)
table = TableDefinition(TableName("demo", "race"), loc, PartitionSchema(("band_shard",)))
arts = DX.load_dedup_artifacts(table, tracker.current_version(table.name))
pt = DX.dedup_pairs_table(table)

def text(doc_id):
    return " ".join(f"w{(doc_id * (7 + 13 * j) + j * j) % 97}" for j in range(20))

for b in range(3):  # 3 batches of 4 docs, ids disjoint per worker
    rows = [(1000 * wid + b * 10 + i, text(1000 * wid + b * 10 + i)) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    DX.extend_dedup_index(df, table, tracker, user_id=f"w{wid}",
                          pairs_table=pt, exclusive=True)
print("DONE", json.dumps({"wid": wid}))
"""


def test_two_process_extend_race_loses_nothing(spark, tmp_path):
    root = str(tmp_path / "_log")
    loc = str(tmp_path / "race")
    tracker = FileBackedVersionTracker(root, use_lock=True)
    table = TableDefinition(
        TableName("demo", "race"), loc, PartitionSchema(("band_shard",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    seed = spark.createDataFrame(
        [(i, _text(i)) for i in range(6)], "doc_id long, text string"
    )
    DX.build_dedup_index(seed, table, tracker, band_shards=8, doc_shards=4)

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, root, loc, str(w)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for w in (1, 2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        assert "DONE" in out

    from chronicles_spark.spark import read_current

    all_ids = set(range(6)) | {
        1000 * w + b * 10 + i
        for w in (1, 2) for b in range(3) for i in range(4)
    }
    docs_table = DX.dedup_docs_table(table)
    got = {
        r["doc_id"]
        for r in read_current(spark, docs_table, tracker).collect()
    }
    assert got == all_ids  # every worker's every batch survived the race

    # the band table equals a from-scratch build of the union corpus
    t2 = FileBackedVersionTracker(str(tmp_path / "_log2"))
    table2 = TableDefinition(
        TableName("demo", "race2"), str(tmp_path / "race2"),
        PartitionSchema(("band_shard",)),
    )
    t2.init_table(table2.name, is_snapshot=False, user_id="t")
    union = spark.createDataFrame(
        [(i, _text(i)) for i in sorted(all_ids)], "doc_id long, text string"
    )
    DX.build_dedup_index(union, table2, t2, band_shards=8, doc_shards=4)

    def bands(tbl, trk):
        return {
            (r["doc_id"], r["band_id"], r["band_key"])
            for r in read_current(spark, tbl, trk).collect()
        }

    assert bands(table, tracker) == bands(table2, t2)
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0

    # the pairs journal stayed PAIRED through the race: the next extend
    # neither refuses a torn pair nor needs a repair
    assert DX.repair_dedup_pairs(table, tracker) is None
    pt = DX.dedup_pairs_table(table)
    DX.extend_dedup_index(
        spark.createDataFrame(
            [(9999, _text(9999))], "doc_id long, text string"
        ),
        table, tracker, pairs_table=pt,
    )
    assert DX.verify_dedup_index(spark, table, tracker).count() == 0
