"""Two-OS-PROCESS cluster-index fold race: each worker runs its own
Spark session and folds its own labeled pair batches into ONE shared
assignment index with ``use_lock=True`` + ``exclusive=True`` — the
per-table flock held across each whole read-modify-write.  The batches
DELIBERATELY bridge across workers (both chains attach to shared low
ids), so cross-process merges relabel clusters the other worker
created.

Pinned guarantee: however the folds interleave, the final assignment
equals the one-shot ``dedup_clusters`` over the union of every folded
pair, the members companion agrees (offline verify empty), and every
batch label is recorded exactly once — the dedup/ANN multiprocess
contract, cluster flavor.
"""

import os
import subprocess
import sys

from chronicles_spark.core.model import (
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.operators import cluster_index as CX, dedup as DD
from chronicles_spark.trackers import FileBackedVersionTracker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, sys
from pyspark.sql import SparkSession
from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import cluster_index as CX
from chronicles_spark.trackers import FileBackedVersionTracker

root, loc, wid = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[2]")
         .appName(f"cluster-race-{wid}")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tracker = FileBackedVersionTracker(root, use_lock=True)
table = TableDefinition(TableName("demo", "crace"), loc,
                        PartitionSchema(("doc_shard",)))

for b in range(3):  # chain within the worker + a bridge to shared id b
    base = 1000 * wid + 10 * b
    pairs = [(base, base + 1), (base + 1, base + 2), (base, b)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    CX.extend_dedup_clusters(df, table, tracker, user_id=f"w{wid}",
                             batch_label=f"w{wid}-b{b}", exclusive=True)
print("DONE", json.dumps({"wid": wid}))
"""


def _all_pairs():
    out = []
    for wid in (1, 2):
        for b in range(3):
            base = 1000 * wid + 10 * b
            out += [(base, base + 1), (base + 1, base + 2), (base, b)]
    return out


def test_two_process_fold_race_loses_nothing(spark, tmp_path):
    root = str(tmp_path / "_log")
    loc = str(tmp_path / "crace")
    tracker = FileBackedVersionTracker(root, use_lock=True)
    table = TableDefinition(
        TableName("demo", "crace"), loc, PartitionSchema(("doc_shard",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    CX.build_dedup_clusters(
        None, table, tracker, doc_shards=8, cluster_shards=4
    )

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

    from chronicles_spark.spark.reader import read_version

    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in read_version(
            spark, table, tracker.current_version(table.name),
            infer_partition_types=False,
        ).select("doc_id", "cluster_id").collect()
    )
    want = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in DD.dedup_clusters(
            spark.createDataFrame(_all_pairs(), "id_a long, id_b long")
        ).select("doc_id", "cluster_id").collect()
    )
    assert got == want and want
    # the bridges worked: both workers' b-chains share cluster b
    as_map = dict(got)
    for b in range(3):
        assert as_map[1000 + 10 * b] == b and as_map[2000 + 10 * b] == b

    assert CX.verify_dedup_clusters(spark, table, tracker).count() == 0
    assert CX.folded_batch_labels(tracker, table.name) == {
        f"w{w}-b{b}" for w in (1, 2) for b in range(3)
    }
