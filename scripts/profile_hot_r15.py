"""Round-15 phase profile of the top remaining bench entries.

Replicates the bench shapes for b6_ann_index_build / b6_ann_extend_upsert /
b9_emb_dedup_extend_full / b11_cluster_fold_200pairs and attributes every
driver action (collect/count/localCheckpoint/write) to its call site.

Diagnostic tooling only.  Run:  python scripts/profile_hot_r15.py [entry...]
"""
from __future__ import annotations

import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from scripts.profile_actions import trace_actions

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    which = set(sys.argv[1:]) or {"b6_build", "b6_upsert", "b9_emb", "b11_fold"}
    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.sources import load_table
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.operators import ann_index as AX
    from chronicles_spark.operators import cluster_index as CXB
    from chronicles_spark.operators import emb_dedup_index as EDX

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("chronicles-profile-r15")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="chronicles_prof_r15_")

    def run(name, fn):
        print(f"\n===== {name} =====", flush=True)
        t0 = time.perf_counter()
        with trace_actions() as log:
            fn()
        print(f"wall: {time.perf_counter() - t0:.2f}s")
        log.report(min_dt=0.01)

    if "b6_build" in which or "b6_upsert" in which:
        ann_tracker = FileBackedVersionTracker(tmp + "/_ann_log")
        ann_table = TableDefinition(
            TableName("bench", "ann"), tmp + "/ann", PartitionSchema(("bucket",))
        )
        ann_tracker.init_table(ann_table.name, is_snapshot=False, user_id="bench")
        emb = load_table(spark, SF_DIR, "embeddings")
        if "b6_build" in which:
            # warm the session first so job-1 JIT noise doesn't pollute
            emb.count()
            run("b6_ann_index_build", lambda: AX.build_ann_index(
                emb, ann_table, ann_tracker, n_clusters=16, m=8, k_sub=16, iters=2
            ))
        else:
            AX.build_ann_index(
                emb, ann_table, ann_tracker, n_clusters=16, m=8, k_sub=16, iters=2
            )
        if "b6_upsert" in which:
            ann_batch = emb.where(F.col("vec_id") < 256)
            AX.extend_ann_index(ann_batch, ann_table, ann_tracker)  # warm
            run("b6_ann_extend_upsert", lambda: AX.extend_ann_index(
                ann_batch, ann_table, ann_tracker
            ))

    if "b9_emb" in which:
        b9_rows = int(os.environ.get("SPARK_GRAFT_B9_ROWS", "60000"))
        b9_dim, b9_planes, b9_bands = 64, 64, 4

        def _b9_corpus(n, start=0):
            return spark.range(start, start + n).select(
                F.col("id").alias("vec_id"),
                F.array(*[
                    F.sin((F.col("id") + 1) * F.lit(0.31 + 0.7 * j)).cast("float")
                    for j in range(b9_dim)
                ]).alias("embedding"),
            )

        d = tempfile.mkdtemp(prefix="b9full_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", "b9full"), d + "/bands",
            PartitionSchema(("band_shard",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        EDX.build_embedding_dedup_index(
            _b9_corpus(b9_rows), tbl, trk, dim=b9_dim, n_planes=b9_planes,
            bands=b9_bands, band_shards=128, doc_shards=128,
        )
        b9_batch4 = _b9_corpus(4, start=20_000_000)
        EDX.extend_embedding_dedup_index(b9_batch4, tbl, trk, threshold=0.9)  # warm
        run("b9_emb_dedup_extend_full", lambda: EDX.extend_embedding_dedup_index(
            b9_batch4, tbl, trk, threshold=0.9
        )[0].count())

    if "b9_text" in which:
        from chronicles_spark.operators import dedup_index as DX

        b8_docs = int(os.environ.get("SPARK_GRAFT_B8_DOCS", "80000"))
        b8_words = 40

        def _b8_corpus(n, start=0):
            words = [
                F.concat(
                    F.lit("w"),
                    ((F.col("id") * F.lit(7 + 13 * j) + F.lit(j * j)) % 997).cast(
                        "string"
                    ),
                )
                for j in range(b8_words)
            ]
            return spark.range(start, start + n).select(
                F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
            )

        d = tempfile.mkdtemp(prefix="b8gfull_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", "b8gfull"), d + "/bands",
            PartitionSchema(("band_shard",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        DX.build_dedup_index(
            _b8_corpus(b8_docs), tbl, trk, band_shards=128, doc_shards=128
        )
        batch = _b8_corpus(64, start=10_000_000)
        DX.extend_dedup_index(batch, tbl, trk)[0].count()  # warm
        batch2 = _b8_corpus(64, start=11_000_000)
        run("b9_dedup_extend_64docs", lambda: DX.extend_dedup_index(
            batch2, tbl, trk
        )[0].count())

    if "b11_fold" in which:
        n_pairs = int(os.environ.get("SPARK_GRAFT_B10C_PAIRS", "50000"))
        d = tempfile.mkdtemp(prefix="b10clu_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", "b10clu"), d + "/assign",
            PartitionSchema(("doc_shard",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        base = spark.range(n_pairs).select(
            F.col("id").alias("id_a"), (F.col("id") + 10_000_000).alias("id_b")
        )
        CXB.build_dedup_clusters(base, tbl, trk, doc_shards=64, cluster_shards=64)
        # warm fold (fresh clusters), then the timed 200-pair fold
        rows = [(100 + 2 * i, 101 + 2 * i) for i in range(200)]
        big = spark.createDataFrame(rows, "id_a long, id_b long")
        warm = spark.createDataFrame([(11, 12), (13, 10_000_014)], "id_a long, id_b long")
        CXB.extend_dedup_clusters(warm, tbl, trk, batch_label="warm-1")
        run("b11_cluster_fold_200pairs", lambda: CXB.extend_dedup_clusters(
            big, tbl, trk, batch_label="prof-big"
        ))


if __name__ == "__main__":
    main()
