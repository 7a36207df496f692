"""Standalone cluster-fold timing harness — the round-15 adjudication of
the b10/b11/b12 bench entries (round-14 VERDICT "What's wrong" #2: the
driver's b12 readings conflicted with the builder's exclusive A/B).

Replicates the bench's fold geometry EXACTLY (same base corpus, same
honest-RMW fresh-id rule, same batch sizes) but in a dedicated process so
runs can be interleaved across two checked-out trees on an idle box:

    python scripts/adjudicate_cluster_fold.py \
        --doc-shards 1024 --cluster-shards 1024 \
        --base-pairs 5000 --batch-pairs 100 --repeats 3

prints one JSON line {"times": [...], "config": {...}}.

``--no-members-barrier`` replaces the fold's members_out lineage barrier
with identity (frames carrying the cluster-shard column pass through) —
the sensitivity probe for the round-14 `members_out` localCheckpoint at
high shard counts.  Assignment correctness is asserted at the end either
way (barrier on/off must agree with the one-shot oracle).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-shards", type=int, default=1024)
    ap.add_argument("--cluster-shards", type=int, default=1024)
    ap.add_argument("--base-pairs", type=int, default=5000)
    ap.add_argument("--batch-pairs", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-members-barrier", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.trackers.files import FileBackedVersionTracker
    from chronicles_spark.operators import cluster_index as CXB
    from chronicles_spark.operators import dedup_index as DX

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("adjudicate-cluster-fold")
        .config("spark.sql.shuffle.partitions", str(2 * int(args.cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.no_members_barrier:
        # identity ONLY for the members_out frame (it carries the cluster
        # shard column); the O(batch) `changed` barrier stays
        real_barrier = CXB.DD.lineage_barrier

        def _selective(df, *a, **kw):
            if CXB.CLUSTER_SHARD_COL in df.columns:
                return df
            return real_barrier(df, *a, **kw)

        CXB.DD.lineage_barrier = _selective

    tmp = tempfile.mkdtemp(prefix="adjud_b12_")
    trk = FileBackedVersionTracker(tmp + "/_log")
    tbl = TableDefinition(
        TableName("bench", "adjclu"), tmp + "/assign", PartitionSchema(("doc_shard",))
    )
    trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
    base = spark.range(args.base_pairs).select(
        F.col("id").alias("id_a"), (F.col("id") + 10_000_000).alias("id_b")
    )
    CXB.build_dedup_clusters(
        base, tbl, trk,
        doc_shards=args.doc_shards, cluster_shards=args.cluster_shards,
    )

    # the bench's honest-RMW rule: every timed fold merges adjacent
    # EXISTING 2-member clusters no prior repeat touched
    def batch(i: int):
        lo = 200 * i
        return spark.range(args.batch_pairs).select(
            (F.col("id") * 2 + lo).alias("id_a"),
            (F.col("id") * 2 + lo + 1).alias("id_b"),
        )

    times = []
    for i in range(args.repeats):
        t0 = time.monotonic()
        CXB.extend_dedup_clusters(
            batch(i), tbl, trk, batch_label=f"adj-{i}"
        )
        times.append(round(time.monotonic() - t0, 3))
        spark.catalog.clearCache()

    # correctness: every merged pair must share one cluster label
    # (barrier on/off must agree — the probe is perf-only)
    from chronicles_spark.spark.reader import read_version

    st = trk.current_version(tbl.name)
    assign = read_version(spark, tbl, st, infer_partition_types=False)
    merged = args.repeats * args.batch_pairs
    pairs_all = batch(0)
    for i in range(1, args.repeats):
        pairs_all = pairs_all.unionByName(batch(i))
    lab = assign.select(F.col("doc_id"), F.col("cluster_id"))
    j = (
        pairs_all.join(
            lab.withColumnRenamed("doc_id", "id_a").withColumnRenamed("cluster_id", "ca"),
            "id_a",
        ).join(
            lab.withColumnRenamed("doc_id", "id_b").withColumnRenamed("cluster_id", "cb"),
            "id_b",
        )
    )
    n_pairs = j.count()
    n_bad = j.where(F.col("ca") != F.col("cb")).count()
    if n_pairs != merged or n_bad:
        raise AssertionError(
            f"fold correctness: {n_pairs}/{merged} pairs found, {n_bad} split"
        )

    print(json.dumps({
        "times": times,
        "min": min(times),
        "config": {
            "doc_shards": args.doc_shards,
            "cluster_shards": args.cluster_shards,
            "base_pairs": args.base_pairs,
            "batch_pairs": args.batch_pairs,
            "members_barrier": not args.no_members_barrier,
            "cpus": args.cpus,
        },
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
