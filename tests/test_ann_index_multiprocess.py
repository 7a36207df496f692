"""Two-OS-PROCESS ANN-index extend race: each worker runs its own Spark
session and upserts a disjoint id set into ONE shared index with
``use_lock=True`` and ``exclusive=True`` — the per-table flock held
across each whole read-modify-write, so extends serialize cleanly
(no Spark output-committer staging clash, no conflicts to retry).

Pinned guarantee: however the retries interleave, NO row is ever lost —
the final index content equals a from-scratch build of the union corpus
under the same artifacts.  (The in-process monkeypatch race in
test_ann_index.py pins the conflict/auto-merge SEMANTICS; this pins the
end-to-end OUTCOME across real processes and real flock serialization.)
"""

import pytest
import json
import os
import subprocess
import sys

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import ann_index as AX
from chronicles_spark.trackers import FileBackedVersionTracker

# slow tier: real OS-process extend race (run via -m "slow or not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, sys
from pyspark.sql import SparkSession
from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import ann_index as AX
from chronicles_spark.trackers import FileBackedVersionTracker

import pytest


root, loc, wid = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[2]")
         .appName(f"ann-race-{wid}")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tracker = FileBackedVersionTracker(root, use_lock=True)
table = TableDefinition(TableName("demo", "race"), loc, PartitionSchema(("bucket",)))
arts = AX.load_ann_artifacts(table, tracker.current_version(table.name))

for b in range(3):  # 3 batches of 4 vectors, ids disjoint per worker
    rows = [
        (1000 * wid + b * 10 + i,
         [float((wid + i) % 3 * 10 + 0.1 * b)] * 8)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    AX.extend_ann_index(df, table, tracker, artifacts=arts,
                        user_id=f"w{wid}", exclusive=True)
print("DONE", json.dumps({"wid": wid}))
"""


def test_two_process_extend_race_loses_nothing(spark, tmp_path):
    root = str(tmp_path / "_log")
    loc = str(tmp_path / "race")
    tracker = FileBackedVersionTracker(root, use_lock=True)
    table = TableDefinition(
        TableName("demo", "race"), loc, PartitionSchema(("bucket",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    cents = [(i, [float(10 * i)] * 8) for i in range(3)]
    books = [[[float(5 * c)] * 4 for c in range(3)] for _ in range(2)]
    seed = spark.createDataFrame(
        [(i, [float(i % 3 * 10)] * 8) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    AX.build_ann_index(seed, table, tracker, centroids=cents, codebooks=books)

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

    got = {
        r["vec_id"] for r in read_current(spark, table, tracker).collect()
    }
    want = set(range(6)) | {
        1000 * w + b * 10 + i
        for w in (1, 2) for b in range(3) for i in range(4)
    }
    assert got == want  # every worker's every batch survived the race

    # and the content equals a from-scratch build of the union corpus
    # (codes-level equality against the racers' logical corpus)
    t2 = FileBackedVersionTracker(str(tmp_path / "_log2"))
    table2 = TableDefinition(
        TableName("demo", "race2"), str(tmp_path / "race2"),
        PartitionSchema(("bucket",)),
    )
    t2.init_table(table2.name, is_snapshot=False, user_id="t")

    def content(tbl, trk):
        return {
            (r["vec_id"], int(r["bucket"]), tuple(r["pq_codes"]))
            for r in read_current(spark, tbl, trk).collect()
        }

    corpus_rows = [(i, [float(i % 3 * 10)] * 8) for i in range(6)] + [
        (1000 * w + b * 10 + i, [float((w + i) % 3 * 10 + 0.1 * b)] * 8)
        for w in (1, 2) for b in range(3) for i in range(4)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>"
    )
    AX.build_ann_index(corpus, table2, t2, centroids=cents, codebooks=books)
    assert content(table, tracker) == content(table2, t2)

    # round 7: the companion id map survived the cross-process race too —
    # every group commit landed both halves under the held flock
    assert AX.verify_ann_id_map(spark, table, tracker).count() == 0
