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

import pytest
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

# slow tier: real OS-process fold/compact races (run via -m "slow or not slow")
pytestmark = pytest.mark.slow

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


_FOLDER = """
import json, sys, time
from pyspark.sql import SparkSession
from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import cluster_index as CX
from chronicles_spark.operators import dedup_index as DX
from chronicles_spark.trackers import FileBackedVersionTracker

root, ploc, aloc, n_batches = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = (SparkSession.builder.master("local[2]")
         .appName("fold-worker")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tracker = FileBackedVersionTracker(root, use_lock=True)
pt = TableDefinition(TableName("demo", "jcrace_pairs"), ploc,
                     PartitionSchema((DX.PAIRS_BATCH_COL,)))
table = TableDefinition(TableName("demo", "jcrace"), aloc,
                        PartitionSchema(("doc_shard",)))
folded = 0
for _ in range(120):
    folded += len(CX.fold_new_dedup_pairs(
        spark, pt, table, tracker, user_id="folder", exclusive=True,
        coalesce_batches=1,
    ))
    if folded >= n_batches:
        break
    time.sleep(0.2)
print("DONE", json.dumps({"folded": folded}))
"""

_COMPACTOR = """
import json, sys, time
from pyspark.sql import SparkSession
from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.operators import cluster_index as CX
from chronicles_spark.operators import dedup_index as DX
from chronicles_spark.trackers import FileBackedVersionTracker

import pytest


root, ploc, aloc, rounds = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = (SparkSession.builder.master("local[2]")
         .appName("compact-worker")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
tracker = FileBackedVersionTracker(root, use_lock=True)
pt = TableDefinition(TableName("demo", "jcrace_pairs"), ploc,
                     PartitionSchema((DX.PAIRS_BATCH_COL,)))
table = TableDefinition(TableName("demo", "jcrace"), aloc,
                        PartitionSchema(("doc_shard",)))
done = 0
deadline = time.time() + 150
while done < rounds and time.time() < deadline:
    if CX.compact_dedup_pairs(
        spark, pt, table, tracker, user_id="compactor",
        min_batches=2, exclusive=True,
    ) is not None:
        done += 1
    time.sleep(0.3)
print("DONE", json.dumps({"compactions": done}))
"""


def test_two_process_fold_while_compact(spark, tmp_path):
    """A folder process consumes the journal batch-by-batch WHILE a
    compactor process consolidates the folded prefix — the supported
    concurrent-maintainer shape (they write disjoint tables; the only
    shared object is the journal, which the folder reads pinned and the
    compactor rewrites content-preservingly).  However the two
    interleave: every batch folds exactly once, the journal's row
    multiset is exactly everything landed, and the final assignment
    equals the one-shot over the union."""
    import json as _json

    from chronicles_spark.operators import dedup_index as DX
    from chronicles_spark.operators.pairing import publish_group
    from chronicles_spark.core.version import generate_version
    from pyspark.sql import functions as F  # noqa: F401

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    root = str(tmp_path / "_log")
    ploc = str(tmp_path / "jcrace_pairs")
    aloc = str(tmp_path / "jcrace")
    tracker = FileBackedVersionTracker(root, use_lock=True)
    pt = TableDefinition(
        TableName("demo", "jcrace_pairs"), ploc,
        PartitionSchema((DX.PAIRS_BATCH_COL,)),
    )
    table = TableDefinition(
        TableName("demo", "jcrace"), aloc, PartitionSchema(("doc_shard",))
    )
    tracker.init_table(pt.name, is_snapshot=False, user_id="t")
    tracker.init_table(table.name, is_snapshot=False, user_id="t")
    CX.build_dedup_clusters(
        None, table, tracker, doc_shards=8, cluster_shards=4
    )

    # 8 pre-landed journal batches; chains bridge across batches via
    # shared low ids so folds merge clusters the compactor's rewrites
    # must never disturb
    n_batches = 8
    all_pairs = []
    for b in range(n_batches):
        base = 100 + 10 * b
        pairs = [(base, base + 1), (base + 1, base + 2), (base, b % 3)]
        all_pairs += pairs
        version = generate_version()
        from pyspark.sql import functions as FF

        df = spark.createDataFrame(pairs, "id_a long, id_b long").withColumn(
            DX.PAIRS_BATCH_COL, FF.lit(version.label)
        )
        publish_group(
            spark, tracker, version, "t", "land pairs", [(pt, df, None, ())]
        )

    env = dict(os.environ, PYTHONPATH=REPO)
    folder = subprocess.Popen(
        [sys.executable, "-c", _FOLDER, root, ploc, aloc, str(n_batches)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    compactor = subprocess.Popen(
        [sys.executable, "-c", _COMPACTOR, root, ploc, aloc, "3"],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    f_out, f_err = folder.communicate(timeout=420)
    c_out, c_err = compactor.communicate(timeout=420)
    assert folder.returncode == 0, f_err[-3000:]
    assert compactor.returncode == 0, c_err[-3000:]
    assert "DONE" in f_out and "DONE" in c_out
    f_stats = _json.loads(f_out.split("DONE", 1)[1].strip())
    c_stats = _json.loads(c_out.split("DONE", 1)[1].strip())
    assert f_stats["folded"] == n_batches
    assert c_stats["compactions"] >= 1  # the race actually happened

    from chronicles_spark.spark.reader import read_version

    journal = read_version(
        spark, pt, tracker.current_version(pt.name),
        infer_partition_types=False,
    ).select("id_a", "id_b")
    assert sorted(
        (r["id_a"], r["id_b"]) for r in journal.collect()
    ) == sorted(all_pairs)

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
            spark.createDataFrame(all_pairs, "id_a long, id_b long")
        ).select("doc_id", "cluster_id").collect()
    )
    assert got == want and want
    assert CX.verify_dedup_clusters(spark, table, tracker).count() == 0
