"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Covers the BASELINE.md self-baseline plan:
  B1 versioned write (all partitions new) + plain-write baseline
  B2 overwrite-one-partition commit
  B3 checkout (rollback) + log listing — must be metadata-only
  B4 current-view read + aggregate vs plain parquet aggregate
  B5 metadata fold/diff queries on a synthetic 10k-partition ops log
plus the pipeline + TPC-H headline queries from __spark_entry__.

Measurement protocol (this box swings 2-4x with external load):
  * every number is the MIN of $SPARK_GRAFT_BENCH_N runs (default 3) —
    min-of-n is the standard noise floor estimator on a shared host;
  * the 1-minute load average is recorded before and after the run so a
    noisy-box artifact is visible in the output itself;
  * a "ratios" block reports versioned-vs-plain for B1/B4 — per the
    project build notes, only ratios are meaningful across rounds here;
  * "value" is the sum of per-query minima (same contract as before).
q_versioned_write_roundtrip times the WRITE + current-view read on a fresh
table each run (the shared fixture that other lifecycle queries read is
prebuilt outside their timed bodies).
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_N", "3"))


def main():
    from pyspark.sql import SparkSession, functions as F

    import __spark_entry__ as entry
    from chronicles_spark.core.model import Partition, PartitionSchema, TableDefinition, TableName
    from chronicles_spark.plans import log_queries as LQ
    from chronicles_spark.plans.synthetic_log import head_ref_df, ops_log_df
    from chronicles_spark.sources import load_table
    from chronicles_spark.spark import read_current, versioned_insert_into
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore
    from chronicles_spark.spark.metastore import InMemoryMetastore

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("chronicles-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    load_start = os.getloadavg()[0]
    tmp = tempfile.mkdtemp(prefix="chronicles_bench_")

    _t_start = time.time()

    def _progress(msg: str) -> None:
        # stderr progress marker (the JSON contract line goes to stdout);
        # makes a wall-budget overrun diagnosable from the log
        print(f"[bench +{time.time() - _t_start:7.1f}s] {msg}", file=sys.stderr, flush=True)

    def timed_min(fn, n=N_RUNS, clear=True) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
            if clear:
                spark.catalog.clearCache()  # no cross-run cache reuse
            gc.collect()  # drop localCheckpoint refs so ContextCleaner frees them
        return round(best, 3)

    def timed_pair(fn_a, fn_b, n=3):
        """Round-10 measurement fix (VERDICT r9 #1): a two-size ratio
        whose sides are measured MINUTES apart reads the box's load
        gradient, not the operators (two rounds of geo-pair readings
        were inflated exactly this way).  Interleave A/B/A/B so each
        pair's two runs are adjacent in time — load hits both sides of
        a pair roughly equally — and report (min_a, min_b,
        min-of-per-pair-ratios, per-pair ratios).  The min-of-pairs
        ratio is the instrument: the quietest adjacent pair is the
        closest this box gets to both sides measured under equal
        conditions."""
        ratios, best_a, best_b = [], float("inf"), float("inf")
        for _ in range(n):
            t0 = time.time()
            fn_a()
            ta = time.time() - t0
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            fn_b()
            tb = time.time() - t0
            spark.catalog.clearCache()
            gc.collect()
            ratios.append(round(ta / tb, 3))
            best_a, best_b = min(best_a, ta), min(best_b, tb)
        return round(best_a, 3), round(best_b, 3), min(ratios), ratios

    _progress("prep: re-split testdata")
    # ---- prep: split the single-file testdata into CPUS files -------------
    # The driver's parquet files are one row group each — unsplittable, so
    # every scan would be a single task and local[N] buys nothing on map
    # stages. Rewriting once (untimed) gives every query honest parallelism;
    # values are identical.
    data_dir = tmp + "/data"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            (
                load_table(spark, SF_DIR, t)  # normalizes NANOS timestamps
                .repartition(int(CPUS))
                .write.mode("overwrite")
                .parquet(f"{data_dir}/{t}.parquet")
            )

    _progress("B1 writes")
    # ---- B1: versioned write vs plain write -------------------------------
    events = load_table(spark, data_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    events.count()  # warm the scan

    results["b1_plain_write"] = timed_min(
        lambda: events.write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(tmp + "/plain")
    )

    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("bench", "events"), tmp + "/versioned", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="bench")
    # each run supersedes every partition with a fresh version — the live
    # view is unchanged, so repeats are idempotent for later sections
    results["b1_versioned_write"] = timed_min(
        lambda: versioned_insert_into(events, table, tracker, "bench", "v1")
    )

    # ---- B2: overwrite one partition --------------------------------------
    one_day = events.where(F.col("event_date") == "2024-01-05")
    results["b2_overwrite_partition"] = timed_min(
        lambda: versioned_insert_into(one_day, table, tracker, "bench", "redo")
    )

    _progress("B3 rollback")
    # ---- B3: rollback + log (metadata-only) -------------------------------
    ms = InMemoryMetastore()
    ms.create_table(table)
    vm = VersionedMetastore(tracker, ms)
    state = tracker.table_state(table.name)
    first_commit = state.updates[1].metadata.commit_id
    head_commit = tracker.table_state(table.name).current_version

    def _rollback_and_log():
        vm.checkout(table, first_commit)
        tracker.updates(table.name)
        vm.checkout(table, head_commit)

    results["b3_rollback_and_log"] = timed_min(_rollback_and_log)

    # ---- B4: current-view read + agg vs plain ------------------------------
    results["b4_plain_agg"] = timed_min(
        lambda: spark.read.parquet(tmp + "/plain")
        .groupBy("event_date")
        .count()
        .collect()
    )
    results["b4_versioned_agg"] = timed_min(
        lambda: read_current(spark, table, tracker)
        .groupBy("event_date")
        .count()
        .collect()
    )

    _progress("B5 fold/diff")
    # ---- B5: metadata algebra on a 10k-partition synthetic log ------------
    big_log = spark.range(10000).select(
        F.col("id").alias("sequence_id"),
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("commit_id"),
        F.lit("bench.table").alias("table_name"),
        F.lit("bench").alias("user_id"),
        F.lit("m").alias("message"),
        F.lit(0).alias("index_in_commit"),
        F.when(F.col("id") % 17 == 0, F.lit("remove_part"))
        .otherwise(F.lit("add_part_version"))
        .alias("operation_type"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("version"),
        F.concat(F.lit("p="), (F.col("id") % 3000).cast("string")).alias("part"),
        F.lit(None).cast("boolean").alias("is_snapshot_table"),
    )
    big_log.persist().count()

    def _fold_diff():
        cur = LQ.current_version_fold(big_log.where(F.col("sequence_id") <= 9000))
        tgt = LQ.current_version_fold(big_log)
        LQ.compute_changes_df(cur, tgt).collect()

    # clear=False keeps the pre-pinned source log cached across runs (the
    # metric is the fold/diff plan, not a 10k-row rebuild); fold results
    # themselves are never cached, so runs stay independent
    results["b5_fold_diff_10k"] = timed_min(_fold_diff, clear=False)
    big_log.unpersist()

    # ---- headline queries from the driver contract ------------------------
    # Pre-build the shared versioned-events fixture (memoized per sf_dir)
    # OUTSIDE the timed bodies, so the lifecycle READ queries below time the
    # operator under test (read / fold / vacuum-scan), not fixture writes.
    entry._write_versioned_events(spark, data_dir)

    qs = entry.queries()
    headline = [
        "q_current_version_fold",
        "q_compute_changes",
        "q_time_travel_read",
        "q_read_changes",
        "q_vacuum_dry_run",
        "q_log_json_read",
        "q_partition_filter",
        "q_tpch_q3",
        "q_token_count",  # r7: carries the merged q_quality_score columns
        "q_ann_index_search",  # r7: the materialized-index hash-checked row
        "q_repetition_signals",
        "q_lang_id",  # r8: carries the merged q_fingerprint columns
        "q_dedup_exact",
        "q_dedup_incremental",  # r8: O(batch) corpus-delta dedup row
        "q_dedup_minhash_lsh",
        "q_dedup_ngram_jaccard",
        "q_dedup_simhash_pairs",  # r10: carries the simhash-index gate
        "q_dedup_embedding",
        "q_dedup_clusters",
        "q_dedup_clusters_incremental",  # r10: journal-fold cluster row
        "q_ann_cosine_topk",  # r13: carries the former q_ann_ivf leg too
        "q_mm_decode_meta",
        "q_mm_dedup_binary",
        "q_stream_windowed_agg",
        "q_sessionize",
        "q_asof_join",
        "q_range_join",
        "q_curate_corpus",
        "q_redact_pii",
        "q_top_ngrams",  # r14: carries the former q_contamination leg too
        "q_semantic_dedup",  # r14: SemDeDup's own hash-checked row
        # round 5: every non-lifecycle queries() entry is timed, so a plan
        # regression in ANY family shows up in the per-round ratios
        "q_running_totals",
        "q_corpus_mixture",
        "q_stratified_sample",
        "q_pack_sequences",
        "q_training_shards",
        "q_emb_transform",
        "q_ann_ivf_kmeans",
        "q_compact_roundtrip",  # fixture memoized: times the tag-pinned read
        "q_snapshot_version_fold",
        "q_updates_log",
        "q_table_state_group",
        "q_tables_list",
        "q_version_parse",  # r9: now also carries the partition-parse checks
        "q_version_paths",
        "q_partition_expr_render",
        "q_dedup_emb_incremental",  # r9: O(batch) embedding-delta dedup row
    ]
    for name in headline:
        df_fn = qs[name]
        results[name] = timed_min(lambda fn=df_fn: fn(spark, data_dir).collect())
        _progress(f"headline {name} = {results[name]}")

    # the honest write roundtrip: fresh table, versioned write of every
    # partition + one overwrite + current-view read-back, all timed
    def _fresh_roundtrip():
        rt_dir = tempfile.mkdtemp(prefix="chronicles_rt_", dir=tmp)
        rt_tracker = FileBackedVersionTracker(rt_dir + "/_log")
        rt_table = TableDefinition(
            TableName("bench", "rt"), rt_dir + "/events", PartitionSchema(("event_date",))
        )
        rt_tracker.init_table(rt_table.name, is_snapshot=False, user_id="bench")
        versioned_insert_into(events, rt_table, rt_tracker, "bench", "v1")
        versioned_insert_into(one_day, rt_table, rt_tracker, "bench", "redo")
        read_current(spark, rt_table, rt_tracker).count()
        shutil.rmtree(rt_dir, ignore_errors=True)

    results["q_versioned_write_roundtrip"] = timed_min(_fresh_roundtrip)

    _progress("b6 ANN family")
    # ---- ANN index family (round 6; gated in _pq_gate, no queries() row:
    # bench evidence lives here) -------------------------------------------
    from chronicles_spark.operators import ann_index as AX, similarity as SIM

    ann_tracker = FileBackedVersionTracker(tmp + "/_ann_log")
    ann_table = TableDefinition(
        TableName("bench", "ann"), tmp + "/ann", PartitionSchema(("bucket",))
    )
    ann_tracker.init_table(ann_table.name, is_snapshot=False, user_id="bench")
    emb = load_table(spark, data_dir, "embeddings")
    # each run is a full fit+encode+publish (a rebuild supersedes — the
    # operator's production refresh shape), so min-of-3 is honest
    results["b6_ann_index_build"] = timed_min(
        lambda: AX.build_ann_index(
            emb, ann_table, ann_tracker, n_clusters=16, m=8, k_sub=16, iters=2
        )
    )
    arts = AX.load_ann_artifacts(
        ann_table, ann_tracker.current_version(ann_table.name)
    )
    ann_q = emb.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    # the in-memory twin RE-ENCODES the corpus per call (its documented
    # shape); the ratio shows what materializing the encode once buys.
    # r11: INTERLEAVED (VERDICT r10 #5) so the contrast's two sides
    # share their load window like the dedup geo pairs already do
    (
        results["b6_ann_indexed_search"],
        results["b6_ann_inmemory_search"],
        ann_search_ratio,
        ann_search_ratios,
    ) = timed_pair(
        lambda: AX.ivfpq_topk_indexed(
            spark, ann_table, ann_tracker, ann_q, k=10, n_probe=2,
            artifacts=arts,
        ).collect(),
        lambda: SIM.ivfpq_topk(
            emb, ann_q, k=10, n_probe=2,
            centroids=arts.centroid_list, codebooks=arts.codebook_list,
        ).collect(),
        n=3,
    )
    # upsert of a 256-vector batch: idempotent (replaces itself), so
    # repeated timed runs measure the same logical operation
    ann_batch = emb.where(F.col("vec_id") < 256)
    results["b6_ann_extend_upsert"] = timed_min(
        lambda: AX.extend_ann_index(ann_batch, ann_table, ann_tracker)
    )
    _progress("b7 locate")
    # ---- r7: the upsert LOCATE's cost class, at two index sizes ----------
    # A synthetic corpus big enough that DATA (not Spark fixed overhead)
    # dominates: SPARK_GRAFT_B7_ROWS (default 400k) 16-dim vectors built
    # from pure column expressions, indexed under injected deterministic
    # artifacts (no fits).  The extend of the SAME 8-vector batch is
    # timed against the full- and half-size mapped index (flat = the
    # O(batch) claim) and against a full-size UNMAPPED index (the old
    # whole-index locate scan, for contrast).  The deterministic
    # ann_locate_read_fraction below is the number that scales.
    import math as _math

    b7_rows = int(os.environ.get("SPARK_GRAFT_B7_ROWS", "400000"))
    b7_dim, b7_k, b7_m, b7_ksub = 16, 64, 4, 8
    b7_cents = [
        (c, [_math.sin(0.7 * c + 1.3 * j) for j in range(b7_dim)])
        for c in range(b7_k)
    ]
    b7_books = [
        [
            [_math.cos(0.9 * code + 0.5 * j + 2.0 * sub) for j in range(b7_dim // b7_m)]
            for code in range(b7_ksub)
        ]
        for sub in range(b7_m)
    ]

    def _b7_corpus(n):
        # deterministic pseudo-random embeddings, pure column exprs
        vec = F.array(*[
            F.sin(F.col("id") * F.lit(0.001 * (j + 1)) + F.lit(j)).cast("double")
            for j in range(b7_dim)
        ])
        return spark.range(n).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        )

    def _b7_index(name, n, mapped):
        d = tempfile.mkdtemp(prefix=f"chronicles_b7_{name}_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", name), d + "/ann", PartitionSchema(("bucket",))
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        AX.build_ann_index(
            _b7_corpus(n), tbl, trk, centroids=b7_cents, codebooks=b7_books,
            id_map_shards=(64 if mapped else None),
        )
        return tbl, trk

    b7_full_t, b7_full_k = _b7_index("b7full", b7_rows, True)
    b7_half_t, b7_half_k = _b7_index("b7half", b7_rows // 2, True)
    b7_nomap_t, b7_nomap_k = _b7_index("b7nomap", b7_rows, False)
    b7_batch = _b7_corpus(8)  # re-submit 8 existing ids: idempotent upsert

    # r11: both ANN extend contrasts run INTERLEAVED (VERDICT r10 #5) —
    # the flat-cost pair (full vs half) and the mapped-vs-scan pair each
    # report a min-of-adjacent-pairs ratio with the spread recorded
    (
        results["b7_ann_extend_mapped_full"],
        results["b7_ann_extend_mapped_half"],
        ann_geo_ratio,
        ann_geo_ratios,
    ) = timed_pair(
        lambda: AX.extend_ann_index(b7_batch, b7_full_t, b7_full_k),
        lambda: AX.extend_ann_index(b7_batch, b7_half_t, b7_half_k),
        n=2,
    )
    # same index size built WITHOUT a map → the old honest whole-index
    # (id, bucket) locate scan per upsert
    (
        _b7_full_again,
        results["b7_ann_extend_scanlocate_full"],
        ann_scan_ratio,
        ann_scan_ratios,
    ) = timed_pair(
        lambda: AX.extend_ann_index(b7_batch, b7_full_t, b7_full_k),
        lambda: AX.extend_ann_index(b7_batch, b7_nomap_t, b7_nomap_k),
        n=2,
    )
    results["b7_ann_extend_mapped_full"] = min(
        results["b7_ann_extend_mapped_full"], _b7_full_again
    )

    # deterministic locate-read evidence (the number that scales, like
    # ann_probe_read_fraction): share of the id map's live shard
    # partitions the 8-id batch's locate reads — and it never opens the
    # INDEX data at all (the scan path reads 100% of it)
    b7_full_state = b7_full_k.current_version(b7_full_t.name)
    b7_map_state = b7_full_k.current_version(
        AX.ann_id_map_table(b7_full_t).name
    )
    b7_arts_full = AX.load_ann_artifacts(b7_full_t, b7_full_state)
    b7_shards = sorted(
        r["s"]
        for r in b7_batch.select(
            AX._shard_col("vec_id", b7_arts_full.id_shards).alias("s")
        ).distinct().collect()
    )
    ann_locate_read_fraction = round(
        len(AX._restrict_to_values(
            b7_map_state, AX.ID_SHARD_COL, b7_shards
        ).partition_versions)
        / max(1, len(b7_map_state.partition_versions)),
        4,
    )

    # recall measurement (r7 operator) — one small sampled-query sweep
    results["b7_ann_recall_sweep"] = timed_min(
        lambda: AX.ann_recall_at_k(
            spark, ann_table, ann_tracker, ann_q.limit(8), emb,
            k=10, n_probes=(2,), artifacts=arts,
        ).collect(),
        n=1,
    )

    # deterministic scale evidence (not a wall-clock number): the share
    # of live index directories a 1-query n_probe=2 batch actually reads
    ann_state = ann_tracker.current_version(ann_table.name)
    probes1 = SIM.select_probes(ann_q.limit(1), arts.centroid_list, 2)
    probed = sorted(
        r["bucket"] for r in probes1.select("bucket").distinct().collect()
    )
    all_buckets = sorted(
        dict(p.column_values)["bucket"]
        for p in ann_state.partition_versions.keys()
    )
    ann_probe_read_fraction = round(
        len(AX.probed_bucket_paths(ann_table, ann_state, probed))
        / max(1, len(AX.probed_bucket_paths(ann_table, ann_state, all_buckets))),
        4,
    )

    _progress("b7 20k sweep")
    # ---- r7: sweep cost at 20k commits, walk vs versions index -----------
    # metadata-only AddPartitionVersion commits (no Spark jobs) build a
    # 20k-commit files log; keep_last is huge so the timing isolates the
    # Add-ops ENUMERATION (the part the index bounds) from deletion
    # probes.  The indexed sweep reads one JSON artifact + the log tail;
    # the walk re-parses every commit file.
    from datetime import datetime, timezone

    from chronicles_spark.core.ops import (
        AddPartitionVersion, TableUpdate, TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.spark.vacuum import vacuum as _vacuum

    # the 20k-commit log is synthetic and format-stable — cache it across
    # bench invocations (first run pays ~90s construction once per box);
    # sweep timings are single-shot (the walk/indexed ratio is ~10x, far
    # above run-to-run noise) to keep the bench inside its wall budget
    big_dir = "/tmp/chronicles_bench20k_v1"
    big_tracker = FileBackedVersionTracker(big_dir + "/_log")
    big_table = TableDefinition(
        TableName("bench", "big"), big_dir + "/big", PartitionSchema(("p",))
    )
    if not os.path.exists(big_dir + "/_done"):
        shutil.rmtree(big_dir, ignore_errors=True)
        big_tracker = FileBackedVersionTracker(big_dir + "/_log")
        big_tracker.init_table(big_table.name, is_snapshot=False, user_id="bench")
        for i in range(20_000):
            big_tracker.commit(
                big_table.name,
                TableUpdate(
                    TableUpdateMetadata.new("bench", "x", datetime.now(timezone.utc)),
                    (AddPartitionVersion(
                        Partition.of(("p", str(i % 16))), generate_version()
                    ),),
                ),
            )
        with open(big_dir + "/_done", "w") as f:
            f.write("ok")
    results["b7_vacuum_20k_walk"] = timed_min(
        lambda: _vacuum(
            big_table, big_tracker, keep_last=10**9, dry_run=True,
            version_index=False,
        ),
        n=1,
    )
    _vacuum(big_table, big_tracker, keep_last=10**9, dry_run=True)  # cut index
    results["b7_vacuum_20k_indexed"] = timed_min(
        lambda: _vacuum(
            big_table, big_tracker, keep_last=10**9, dry_run=True,
            version_index=True,
        ),
        n=1,
    )

    _progress("b8/b9 incremental dedup")
    # ---- incremental dedup index: flat cost + O(corpus) contrast -------
    # Round-9 protocol CORRECTION (recorded in BASELINE.md): the r8 pair
    # (b8_dedup_extend_full/half) kept ONE fixed 64-shard geometry for
    # both corpus sizes, and its 64-doc × 8-band batch saturated every
    # band AND doc shard by pigeonhole — the RMW rewrote the entire
    # state and the ratio read corpus bytes, not extend cost.
    # Production holds per-shard bytes CONSTANT via the sizing rule
    # (rebuild_dedup_index: double the shards when the corpus doubles)
    # and a daily delta touches b·B << shards.  The b9 geo pair measures
    # exactly that invariant: full-size corpus at 2x the shards vs
    # half-size at 1x, same 4-doc batch → both sides touch ≤ 32
    # equal-sized band shards + ≤ 4 equal-sized doc shards, so a flat
    # ratio is the structural claim.  The r8 entries' history lives in
    # BASELINE.md; the O(corpus) contrast keeps its r8 name/protocol.
    from chronicles_spark.operators import dedup as _DDmod
    from chronicles_spark.operators import dedup_index as DX

    b8_docs = int(os.environ.get("SPARK_GRAFT_B8_DOCS", "80000"))
    b8_words = 40

    def _b8_corpus(n, start=0):
        # ~b8_words pseudo-random words per doc over a 997-word vocab —
        # realistic shingle cardinality, fully deterministic
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

    def _b8_index(name, n, shards):
        d = tempfile.mkdtemp(prefix=f"chronicles_b8_{name}_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", name), d + "/bands",
            PartitionSchema(("band_shard",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        DX.build_dedup_index(
            _b8_corpus(n), tbl, trk, band_shards=shards, doc_shards=shards
        )
        return tbl, trk

    b8g_full_t, b8g_full_k = _b8_index("b8gfull", b8_docs, 128)
    b8g_half_t, b8g_half_k = _b8_index("b8ghalf", b8_docs // 2, 64)
    b8g_batch = _b8_corpus(4, start=20_000_000)
    # round-10: the geo pair runs INTERLEAVED (A/B/A/B, min-of-pairs
    # ratio, n=3 per side) so the driver's own snapshot measures both
    # sides under adjacent load — the r9 readings moved with the box's
    # load gradient, not the operator (VERDICT r9 #1)
    (
        results["b9_dedup_extend_geo_full"],
        results["b9_dedup_extend_geo_half"],
        geo_text_ratio,
        geo_text_ratios,
    ) = timed_pair(
        lambda: DX.extend_dedup_index(b8g_batch, b8g_full_t, b8g_full_k)[0]
        .count(),
        lambda: DX.extend_dedup_index(b8g_batch, b8g_half_t, b8g_half_k)[0]
        .count(),
        n=3,
    )

    # the r8 64-doc daily batch against the geometry-faithful full index
    # vs the one-shot whole-corpus re-run it replaces (the O(corpus)
    # contrast; re-run entry keeps its r8 name; r10 interleaves the
    # pair so the ratio's numerator and denominator share their load)
    b8_batch = _b8_corpus(64, start=10_000_000)  # genuinely new ids
    (
        results["b9_dedup_extend_64docs"],
        results["b8_dedup_full_rerun"],
        text_rerun_ratio,
        text_rerun_ratios,
    ) = timed_pair(
        lambda: DX.extend_dedup_index(b8_batch, b8g_full_t, b8g_full_k)[0]
        .count(),
        lambda: _DDmod.minhash_dedup(
            _b8_corpus(b8_docs).unionByName(b8_batch)
        ).count(),
        n=2,
    )

    # structural read-fraction evidence: share of live band-shard
    # partitions a 4-doc delta's candidate read opens on the geometry-
    # faithful full index — the per-doc cost is ≤ bands shard opens
    # regardless of corpus size, and within each opened shard the pushed
    # band-key IN-list prunes to the batch's row groups
    b8_state = b8g_full_k.current_version(b8g_full_t.name)
    b8_arts = DX.load_dedup_artifacts(b8g_full_t, b8_state)
    b8_banded = _DDmod.lsh_banded(
        b8g_batch.select(
            "doc_id", _DDmod.shingles_of(F.col("text")).alias("shingles")
        ),
        "doc_id", b8_arts.bands, b8_arts.rows,
    ).withColumn("band_shard", DX._band_shard_col(b8_arts.band_shards))
    b8_shards = sorted(
        r["band_shard"]
        for r in b8_banded.select("band_shard").distinct().collect()
    )
    dedup_band_read_fraction = round(
        len(DX._restrict_to_values(
            b8_state, DX.BAND_SHARD_COL, b8_shards
        ).partition_versions)
        / max(1, len(b8_state.partition_versions)),
        4,
    )

    _progress("b9 incremental embedding dedup")
    # ---- r9: incremental EMBEDDING dedup index — same two-size flat-cost
    # protocol as b8, embedding family (sign-LSH bander + exact-cosine
    # verifier over the shared core).  n_planes=64/bands=4 gives 16-bit
    # band keys (~65k buckets/band) so synthetic-vector buckets stay
    # sparse — the (n_planes, bands) recall/cost dial the one-shot
    # operator documents, at the setting a 100k-vector corpus needs.
    from chronicles_spark.operators import emb_dedup_index as EDX

    b9_rows = int(os.environ.get("SPARK_GRAFT_B9_ROWS", "60000"))
    # dim 64 so the one-shot's O(corpus) encode term (n_planes × dim
    # multiply-folds per vector) is realistically heavy — at toy dims
    # both sides are fixed-overhead-dominated and the contrast is mush
    b9_dim, b9_planes, b9_bands = 64, 64, 4

    def _b9_corpus(n, start=0):
        # deterministic smooth-curve vectors; +1 offset keeps id 0 off
        # the all-zero vector (undefined cosine)
        return spark.range(start, start + n).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                F.sin((F.col("id") + 1) * F.lit(0.31 + 0.7 * j)).cast("float")
                for j in range(b9_dim)
            ]).alias("embedding"),
        )

    def _b9_index(name, n, shards):
        d = tempfile.mkdtemp(prefix=f"chronicles_b9_{name}_", dir=tmp)
        trk = FileBackedVersionTracker(d + "/_log")
        tbl = TableDefinition(
            TableName("bench", name), d + "/bands",
            PartitionSchema(("band_shard",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        EDX.build_embedding_dedup_index(
            _b9_corpus(n), tbl, trk, dim=b9_dim, n_planes=b9_planes,
            bands=b9_bands, band_shards=shards, doc_shards=shards,
        )
        return tbl, trk

    # geometry-faithful two-size pair (the b8g protocol): full corpus at
    # 2x the shards vs half at 1x, 4-vector batch → equal touched-shard
    # counts and bytes on both sides by construction
    b9_full_t, b9_full_k = _b9_index("b9full", b9_rows, 128)
    b9_half_t, b9_half_k = _b9_index("b9half", b9_rows // 2, 64)
    b9_batch4 = _b9_corpus(4, start=20_000_000)
    (
        results["b9_emb_dedup_extend_full"],
        results["b9_emb_dedup_extend_half"],
        geo_emb_ratio,
        geo_emb_ratios,
    ) = timed_pair(
        lambda: EDX.extend_embedding_dedup_index(
            b9_batch4, b9_full_t, b9_full_k, threshold=0.9
        )[0].count(),
        lambda: EDX.extend_embedding_dedup_index(
            b9_batch4, b9_half_t, b9_half_k, threshold=0.9
        )[0].count(),
        n=3,
    )
    # the O(corpus) one-shot the extend replaces (contrast against the
    # geometry-faithful extend above — at toy scale both sides carry
    # ~10 fixed Spark-job overheads, so the ratio here UNDERSTATES the
    # production gap: the one-shot's encode + band self-join + exact
    # verify all grow with the corpus, the extend's terms don't);
    # interleaved like the text contrast
    (
        _emb_extend_again,
        results["b9_emb_dedup_full_rerun"],
        emb_rerun_ratio,
        emb_rerun_ratios,
    ) = timed_pair(
        lambda: EDX.extend_embedding_dedup_index(
            b9_batch4, b9_full_t, b9_full_k, threshold=0.9
        )[0].count(),
        lambda: _DDmod.embedding_lsh_dedup(
            _b9_corpus(b9_rows).unionByName(b9_batch4), dim=b9_dim,
            threshold=0.9, n_planes=b9_planes, bands=b9_bands,
        ).count(),
        n=2,
    )

    # structural read-fraction: share of live band shards the 4-vector
    # delta's candidate read opens (≤ bands per vector by pigeonhole)
    b9_state = b9_full_k.current_version(b9_full_t.name)
    b9_arts = EDX.load_embedding_dedup_artifacts(b9_full_t, b9_state)
    b9_banded = _DDmod.sign_lsh_banded(
        b9_batch4, b9_arts.dim, "vec_id", "embedding",
        b9_arts.n_planes, b9_arts.bands,
    ).withColumn("band_shard", DX._band_shard_col(b9_arts.band_shards))
    b9_shards = sorted(
        r["band_shard"]
        for r in b9_banded.select("band_shard").distinct().collect()
    )
    emb_dedup_band_read_fraction = round(
        len(DX._restrict_to_values(
            b9_state, DX.BAND_SHARD_COL, b9_shards
        ).partition_versions)
        / max(1, len(b9_state.partition_versions)),
        4,
    )

    _progress("b10 cluster fold")
    # ---- r10: incremental duplicate-cluster fold (VERDICT r9 #2) ------
    # A 100k-assignment index (deterministic disjoint pairs, 64 doc/
    # cluster shards) receives a 4-pair fold that bridges existing
    # clusters — the daily shape.  The wall entry times the fold; the
    # structural fraction is the number that scales: the endpoints'
    # lookup opens ≤ min(2P, doc_shards) of the live assign shards
    # regardless of corpus size (the id-map pigeonhole).  Repeats are
    # honest: each timed fold carries a fresh batch label and touches
    # the same two clusters (idempotent relabels after the first).
    from chronicles_spark.operators import cluster_index as CXB

    # 50k pairs keeps the one-shot bootstrap build ~60s; the fold's cost
    # and the read fraction are batch-bounded, not corpus-bounded, so a
    # bigger corpus only buys bench wall (the flat-cost structural claim
    # rides cluster_fold_read_fraction either way)
    b10c_pairs = int(os.environ.get("SPARK_GRAFT_B10C_PAIRS", "50000"))
    b10c_dir = tempfile.mkdtemp(prefix="chronicles_b10_clu_", dir=tmp)
    b10c_trk = FileBackedVersionTracker(b10c_dir + "/_log")
    b10c_tbl = TableDefinition(
        TableName("bench", "b10clu"), b10c_dir + "/assign",
        PartitionSchema(("doc_shard",)),
    )
    b10c_trk.init_table(b10c_tbl.name, is_snapshot=False, user_id="bench")
    b10c_base = spark.range(b10c_pairs).select(
        F.col("id").alias("id_a"), (F.col("id") + 10_000_000).alias("id_b")
    )
    CXB.build_dedup_clusters(
        b10c_base, b10c_tbl, b10c_trk, doc_shards=64, cluster_shards=64
    )
    b10c_n = {"i": 0}

    def _b10c_pairs(i):
        # ids shift with the iteration counter (ADVICE r10): each timed
        # fold bridges DIFFERENT existing clusters, so every repeat
        # performs the full endpoint-lookup + relabel + RMW write —
        # identical pairs would hit the no-change early-return after
        # the first fold and timed_min would report the cheaper path
        base = 100 * i
        return spark.createDataFrame(
            [(base + 11, base + 12), (base + 13, 10_000_014 + base)],
            "id_a long, id_b long",
        )

    def _b10c_fold_once():
        b10c_n["i"] += 1
        CXB.extend_dedup_clusters(
            _b10c_pairs(b10c_n["i"]), b10c_tbl, b10c_trk,
            batch_label=f"bench-{b10c_n['i']}",
        )

    results["b10_cluster_fold_4pairs"] = timed_min(_b10c_fold_once, n=2)
    b10c_state = b10c_trk.current_version(b10c_tbl.name)

    def _b10c_fraction(fold_df):
        shards = sorted(
            r["s"]
            for r in fold_df.select(
                F.explode(F.array("id_a", "id_b")).alias("doc_id")
            ).select(
                DX._doc_shard_col("doc_id", 64).alias("s")
            ).distinct().collect()
        )
        return round(
            len(DX._restrict_to_values(
                b10c_state, DX.DOC_SHARD_COL, shards
            ).partition_versions)
            / max(1, len(b10c_state.partition_versions)),
            4,
        )

    cluster_fold_read_fraction = _b10c_fraction(_b10c_pairs(1))
    # r11 (VERDICT r10 #6): the pigeonhole CURVE — a 200-pair (400-
    # endpoint) fold against the same 64-shard layout saturates
    # min(endpoints, doc_shards) by pigeonhole, so the fraction is the
    # honest ~1.0 cap; production sizing keeps endpoints ≪ shards (the
    # b9 geo sizing rule), where the 4-endpoint fraction is the regime.
    # The timed fold shows the absolute cost stays batch-bounded.
    # each pair merges two distinct existing 2-member clusters (adjacent
    # base ids) — a genuine 200-merge RMW, not a no-op re-submission
    b10c_big = spark.range(200).select(
        (F.col("id") * 2 + 30_000).alias("id_a"),
        (F.col("id") * 2 + 30_001).alias("id_b"),
    )
    cluster_fold_read_fraction_200pairs = _b10c_fraction(b10c_big)
    results["b11_cluster_fold_200pairs"] = timed_min(
        lambda: CXB.extend_dedup_clusters(
            b10c_big, b10c_tbl, b10c_trk,
            batch_label="bench-big",
        ),
        n=1,
    )

    _progress("b10 simhash dedup index")
    # ---- r10: the SIMHASH index family's scale evidence (VERDICT r9
    # missing #3) — the correctness gate rides q_dedup_simhash_pairs;
    # here the extend's wall cost and its structural read fraction:
    # a 4-doc batch's fingerprint slices open ≤ bands·4 of the 64 band
    # shards regardless of corpus size (the shared-core pigeonhole)
    from chronicles_spark.operators import simhash_index as SIX

    b10_docs = int(os.environ.get("SPARK_GRAFT_B10_DOCS", "20000"))
    b10_dir = tempfile.mkdtemp(prefix="chronicles_b10_sim_", dir=tmp)
    b10_trk = FileBackedVersionTracker(b10_dir + "/_log")
    b10_tbl = TableDefinition(
        TableName("bench", "b10sim"), b10_dir + "/bands",
        PartitionSchema(("band_shard",)),
    )
    b10_trk.init_table(b10_tbl.name, is_snapshot=False, user_id="bench")
    SIX.build_simhash_dedup_index(
        _b8_corpus(b10_docs), b10_tbl, b10_trk,
        bits=32, bands=4, band_shards=64, doc_shards=64,
    )
    b10_batch = _b8_corpus(4, start=30_000_000)
    results["b10_simhash_extend_4docs"] = timed_min(
        lambda: SIX.extend_simhash_dedup_index(
            b10_batch, b10_tbl, b10_trk, max_hamming=3
        )[0].count(),
        n=2,
    )
    b10_state = b10_trk.current_version(b10_tbl.name)
    b10_arts = SIX.load_simhash_dedup_artifacts(b10_tbl, b10_state)
    b10_banded = SIX._sim_family(b10_arts, "doc_id", None).band_fn(
        b10_batch.select(
            "doc_id",
            _DDmod.simhash_expr("text", b10_arts.bits).alias("simhash"),
        )
    ).withColumn("band_shard", DX._band_shard_col(b10_arts.band_shards))
    b10_shards = sorted(
        r["band_shard"]
        for r in b10_banded.select("band_shard").distinct().collect()
    )
    simhash_band_read_fraction = round(
        len(DX._restrict_to_values(
            b10_state, DX.BAND_SHARD_COL, b10_shards
        ).partition_versions)
        / max(1, len(b10_state.partition_versions)),
        4,
    )

    _progress("b11 extend vs log depth")
    # ---- r11: the metadata plane is O(tail) (VERDICT r10 weak #1) ----
    # One extend of the SAME 4-doc batch against two same-size text
    # indexes whose PRIMARY logs differ only in depth: ~20k extra
    # ops-less commits (the streaming-maintenance shape after 20k
    # micro-batches) vs the natural shallow log.  pinned_state used to
    # read+parse EVERY commit file, 2-3 tables per extend — quadratic
    # cumulative under streaming; it now resolves through the fold
    # checkpoint + tail (head_resolution), so the pair should read
    # ~flat.  The structural guarantee in file units is pinned by
    # tests/test_pinned_state_fast.py; this is the wall-clock twin,
    # interleaved per the r10 instrument.
    from chronicles_spark.core.ops import (
        TableUpdate as _TU,
        TableUpdateMetadata as _TUM,
    )

    b11_commits = int(os.environ.get("SPARK_GRAFT_B11_COMMITS", "20000"))
    b11_deep_t, b11_deep_k = _b8_index("b11deep", 4000, 16)
    b11_shal_t, b11_shal_k = _b8_index("b11shal", 4000, 16)
    for _ in range(b11_commits):
        b11_deep_k.commit(b11_deep_t.name, _TU(_TUM.new("bench", "noise"), ()))
    b11_batch = _b8_corpus(4, start=40_000_000)
    (
        results["b11_extend_deep_log"],
        results["b11_extend_shallow_log"],
        b11_depth_ratio,
        b11_depth_ratios,
    ) = timed_pair(
        lambda: DX.extend_dedup_index(b11_batch, b11_deep_t, b11_deep_k)[0]
        .count(),
        lambda: DX.extend_dedup_index(b11_batch, b11_shal_t, b11_shal_k)[0]
        .count(),
        n=2,
    )

    # r11: CDC batch poll vs the full walk it replaced, on the SAME deep
    # log.  changed_partitions(from=recent, to=head) rides version_at's
    # retained-checkpoint walk — O(lag) commit-file reads; it previously
    # materialized table_state per poll (~20k file reads+parses here).
    # The contrast is poll/full-walk on one log (interleaved) rather
    # than deep-vs-shallow: a poll's residual depth-dependence is the
    # ONE directory listing every checkpointed fast path shares (no
    # commit-file reads), which on a sub-ms shallow denominator would
    # dominate the ratio and misread as O(history).  The file-unit twin
    # is tests/test_pinned_state_fast.py::
    # test_changed_partitions_reads_o_tail.
    from chronicles_spark.spark.reader import changed_partitions as _cp

    # 20-commit lag, clamped for smoke runs whose logs are shallower
    _b11_pos = max(0, b11_deep_k.update_count(b11_deep_t.name) - 20)
    b11_deep_from = b11_deep_k.updates_slice(
        b11_deep_t.name, _b11_pos, _b11_pos + 1
    )[0].metadata.commit_id
    (
        results["b11_cdc_poll_deep_log"],
        results["b11_cdc_poll_deep_full_walk"],
        b11_poll_ratio,
        b11_poll_ratios,
    ) = timed_pair(
        lambda: len(_cp(b11_deep_t, b11_deep_k, b11_deep_from)[0]),
        lambda: len(b11_deep_k.table_state(b11_deep_t.name).updates),
        n=3,
    )

    _progress("b12 commit-log archival")
    # ---- r12: archival bounds the resolution LISTING (VERDICT r11 #1) ----
    # pinned_state on the b11 deep log lists ~20k dirents per resolution
    # (the one O(history) term left after r11's O(tail) file reads);
    # archive_commits packs the checkpoint-covered prefix into one
    # artifact, after which the same resolution lists O(tail) dirents.
    # Pre/post cannot interleave (archival is one-way) — disclosed; both
    # sides are 20-resolution loops of a pure-metadata op with a fresh
    # tracker instance per loop (no instance caches), so the pair is
    # load-insensitive at the ~ms scale where listing cost lives.  The
    # structural twin (dirent counts) is tests/test_commit_archive.py::
    # test_archive_listing_stays_o_tail.
    from chronicles_spark.operators.pairing import pinned_state as _ps12

    def _b12_resolve():
        k = FileBackedVersionTracker(b11_deep_k.root)
        for _ in range(20):
            _ps12(k, b11_deep_t.name)

    results["b12_resolve_deep_log_unarchived"] = timed_min(
        _b12_resolve, n=3, clear=False
    )
    _b12_t0 = time.time()
    _b12_out = b11_deep_k.archive_commits(
        b11_deep_t.name, retain_checkpoints=2
    )
    results["b12_archive_pack_once"] = round(time.time() - _b12_t0, 3)
    results["b12_resolve_deep_log_archived"] = timed_min(
        _b12_resolve, n=3, clear=False
    )

    _progress("b13 steady-state archival curve")
    # ---- r13: the O(live tail + chunks) claim as a CURVE (VERDICT r12
    # #3): N incremental archive_commits runs over a log that grows 10x,
    # recording resolution time + dirents per stage.  If resolution were
    # O(history) the last stage would read ~10x the first; O(tail +
    # chunks) reads ~flat (dirents grow only by the per-run chunk
    # count).  Stages cannot interleave (growth is one-way) — disclosed;
    # each stage's resolve is a 20-resolution loop of a pure-metadata op
    # (fresh tracker per loop), the same load-insensitive instrument as
    # b12, and the per-stage dirent count is a structural unit no load
    # can move.  The 256 KiB chunk cap makes the chunked layout (round
    # 13) the thing being measured: ~24 chunks by the last stage, so
    # "archives stay O(runs + history/cap) dirents" is exercised rather
    # than one blob hiding the curve.
    b13_total = int(os.environ.get("SPARK_GRAFT_B13_COMMITS", "20000"))
    b13_dir = tempfile.mkdtemp(prefix="chronicles_b13_", dir=tmp)
    b13_trk = FileBackedVersionTracker(b13_dir, checkpoint_interval=100)
    b13_tbl_name = TableName("bench", "b13log")
    b13_trk.init_table(b13_tbl_name, is_snapshot=False, user_id="bench")
    b13_d = b13_trk._table_dir(b13_tbl_name)
    b13_stages = sorted({max(200, round(f * b13_total)) for f in
                         (0.1, 0.2, 0.4, 0.7, 1.0)})
    b13_commits_curve, b13_resolve_curve = [], []
    b13_dirents_curve, b13_chunks_curve = [], []
    b13_done = 0
    for b13_target in b13_stages:
        for _ in range(b13_target - b13_done):
            b13_trk.commit(
                b13_tbl_name, _TU(_TUM.new("bench", "noise"), ())
            )
        b13_done = b13_target
        b13_trk.archive_commits(
            b13_tbl_name, retain_checkpoints=2, max_chunk_bytes=256 * 1024
        )

        def _b13_resolve():
            k = FileBackedVersionTracker(b13_dir, checkpoint_interval=100)
            for _ in range(20):
                _ps12(k, b13_tbl_name)

        b13_commits_curve.append(b13_target)
        b13_resolve_curve.append(timed_min(_b13_resolve, n=2, clear=False))
        b13_listing = b13_trk.fs.list_dir(b13_d)
        b13_dirents_curve.append(len(b13_listing))
        b13_chunks_curve.append(
            sum(1 for n in b13_listing if n.startswith("archive_"))
        )
    results["b13_resolve_after_10x_growth"] = b13_resolve_curve[-1]
    results["b13_resolve_at_first_stage"] = b13_resolve_curve[0]

    _progress("b12 cluster fold production regime")
    # ---- r12: the cluster-fold read fraction in the PRODUCTION regime
    # (VERDICT r11 #3): endpoints ≪ shards.  The 64-shard toy saturates
    # by pigeonhole at a few hundred endpoints (the honest r11 1.0); a
    # 1024-shard layout — the b9 geo sizing rule applied to a corpus 16×
    # the toy — keeps a 100-pair (200-endpoint) fold's lookup at
    # ~endpoints/shards of the assignment shards.  The interleaved wall
    # pair folds the SAME batch size on both layouts: cost stays
    # batch-bounded, only the touched-shard fraction moves.
    b12c_dir = tempfile.mkdtemp(prefix="chronicles_b12_clu_", dir=tmp)
    b12c_trk = FileBackedVersionTracker(b12c_dir + "/_log")
    b12c_tbl = TableDefinition(
        TableName("bench", "b12clu"), b12c_dir + "/assign",
        PartitionSchema(("doc_shard",)),
    )
    b12c_trk.init_table(b12c_tbl.name, is_snapshot=False, user_id="bench")
    b12c_base = spark.range(5000).select(
        F.col("id").alias("id_a"), (F.col("id") + 10_000_000).alias("id_b")
    )
    CXB.build_dedup_clusters(
        b12c_base, b12c_tbl, b12c_trk, doc_shards=1024, cluster_shards=1024
    )
    b12c_n = {"i": 0}

    def _b12c_pairs(i, lo=0):
        # 100 pairs of adjacent EXISTING 2-member clusters, fresh ids per
        # repeat (the b10 honest-RMW rule: every timed fold merges
        # clusters no prior repeat touched)
        base = lo + 200 * i
        return spark.range(100).select(
            (F.col("id") * 2 + base).alias("id_a"),
            (F.col("id") * 2 + base + 1).alias("id_b"),
        )

    def _b12c_fold_1024():
        b12c_n["i"] += 1
        CXB.extend_dedup_clusters(
            _b12c_pairs(b12c_n["i"] - 1), b12c_tbl, b12c_trk,
            batch_label=f"b12-{b12c_n['i']}",
        )

    def _b12c_fold_64():
        # same batch size on the 64-shard toy layout (ids distinct from
        # every earlier b10c fold)
        CXB.extend_dedup_clusters(
            _b12c_pairs(b12c_n["i"] - 1, lo=40_000), b10c_tbl, b10c_trk,
            batch_label=f"b12toy-{b12c_n['i']}",
        )

    (
        results["b12_cluster_fold_100pairs_1024shards"],
        results["b12_cluster_fold_100pairs_64shards"],
        b12c_ratio,
        b12c_ratios,
    ) = timed_pair(_b12c_fold_1024, _b12c_fold_64, n=2)
    b12c_state = b12c_trk.current_version(b12c_tbl.name)
    b12c_shards = sorted(
        r["s"]
        for r in _b12c_pairs(b12c_n["i"]).select(
            F.explode(F.array("id_a", "id_b")).alias("doc_id")
        ).select(
            DX._doc_shard_col("doc_id", 1024).alias("s")
        ).distinct().collect()
    )
    cluster_fold_read_fraction_100pairs_1024shards = round(
        len(DX._restrict_to_values(
            b12c_state, DX.DOC_SHARD_COL, b12c_shards
        ).partition_versions)
        / max(1, len(b12c_state.partition_versions)),
        4,
    )

    _progress("b14: wide-table metadata plane + group-consistent resolve")
    # round 14: (a) the driver-side O(partitions) term of a current-view
    # read, tracked as µs/partition at 200k synthetic partitions (pure
    # metadata, no Spark action — the docs/scale.md 'wide-table reads'
    # bound's tracked proxy); (b) read_group_states (group-consistent
    # 2-table resolve) vs two independent pinned_state resolves on the
    # SAME log — interleaved pair; ≈1.0 means group consistency is free.
    from chronicles_spark.core.model import PartitionedTableVersion
    from chronicles_spark.operators.pairing import (
        pair_message,
        pinned_state,
        read_group_states,
    )
    from chronicles_spark.spark.reader import live_paths

    _b14_tbl = TableDefinition(
        TableName("bench", "wide"), tmp + "/b14_wide", PartitionSchema(("p",))
    )
    _b14_v = generate_version()
    _b14_state = PartitionedTableVersion(
        {Partition.of(("p", str(i))): _b14_v for i in range(200_000)}
    )
    results["b14_live_paths_200k"] = timed_min(
        lambda: live_paths(_b14_tbl, _b14_state), n=3, clear=False
    )
    b14_us_per_partition = round(
        results["b14_live_paths_200k"] / 200_000 * 1e6, 2
    )

    _b14_root = tmp + "/b14_group_log"
    _b14_trk = FileBackedVersionTracker(_b14_root, checkpoint_interval=5)
    _b14_a = TableName("bench", "gdocs")
    _b14_b = TableName("bench", "gembs")
    for _t in (_b14_a, _b14_b):
        _b14_trk.init_table(_t, is_snapshot=False, user_id="b")
    for _i in range(40):
        _lbl = generate_version().label
        _b14_trk.commit_group({
            _t: TableUpdate(
                TableUpdateMetadata.new("b", pair_message(f"g{_i}", _lbl)),
                (AddPartitionVersion(
                    Partition.of(("p", str(_i % 8))), generate_version()
                ),),
            )
            for _t in (_b14_a, _b14_b)
        })

    def _b14_group_resolve():
        for _ in range(20):  # sub-ms single resolves: loop above clock res
            read_group_states(_b14_trk, [_b14_a, _b14_b])

    def _b14_independent_resolve():
        for _ in range(20):
            pinned_state(_b14_trk, _b14_a)
            pinned_state(_b14_trk, _b14_b)

    (
        results["b14_read_group_resolve"],
        results["b14_independent_resolve"],
        b14_group_ratio,
        b14_group_ratios,
    ) = timed_pair(_b14_group_resolve, _b14_independent_resolve, n=3)

    _progress("fold incremental + headline")
    # incremental (checkpointed) fold — kept here after its queries() entry
    # was merged into q_current_version_fold, so the plan stays benchmarked
    def _fold_incremental():
        ops = ops_log_df(spark, data_dir)
        ckpt = LQ.fold_state_checkpoint(ops, upto_seq=15, table_name="demo.events")
        LQ.current_version_fold_incremental(
            ops, ckpt, 15, head_ref_df(spark, data_dir), "demo.events"
        ).collect()

    results["q_fold_incremental"] = timed_min(_fold_incremental)

    shutil.rmtree(tmp, ignore_errors=True)
    total = round(sum(results.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    def _ratio(a: str, b: str) -> float:
        return round(results[a] / results[b], 3) if results.get(b) else None

    payload = json.dumps(
            {
                "metric": "chronicles_spark bench: versioned-lake ops + pipeline + TPC-H headline queries",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf),
                "cpus": int(CPUS),
                "runs_per_query": N_RUNS,
                "loadavg_1min": {"start": load_start, "end": os.getloadavg()[0]},
                "ratios": {
                    "b1_versioned_over_plain_write": _ratio(
                        "b1_versioned_write", "b1_plain_write"
                    ),
                    "b4_versioned_over_plain_agg": _ratio(
                        "b4_versioned_agg", "b4_plain_agg"
                    ),
                    # r11: the ANN contrasts are interleaved too
                    # (VERDICT r10 #5) — min-of-adjacent-pairs ratio +
                    # full spread, like the dedup geo pairs
                    "b6_ann_indexed_over_inmemory_search": ann_search_ratio,
                    "b6_ann_search_pair_ratios": ann_search_ratios,
                    # r7 scaling evidence: mapped locate should NOT grow
                    # with index size (≈1.0); the full scan roughly
                    # doubles half→full; mapped-vs-scan at full size is
                    # the absolute saving at this (tiny) scale
                    "b7_ann_extend_mapped_full_over_half": ann_geo_ratio,
                    "b7_ann_extend_geo_pair_ratios": ann_geo_ratios,
                    "b7_ann_extend_mapped_over_scanlocate": ann_scan_ratio,
                    "b7_ann_extend_scan_pair_ratios": ann_scan_ratios,
                    # r7: indexed sweep vs full walk at 20k commits
                    "b7_vacuum_20k_indexed_over_walk": _ratio(
                        "b7_vacuum_20k_indexed", "b7_vacuum_20k_walk"
                    ),
                    # r9 protocol, r10 instrument: flat cost under the
                    # production invariant (per-shard bytes held
                    # constant by the sizing rule, batch touches
                    # b*B << shards), now measured INTERLEAVED — the
                    # ratio is the min over A/B-adjacent pairs, so box
                    # load hits both sides of the reported pair equally
                    # (VERDICT r9 #1); the *_pair_ratios lists show the
                    # full spread
                    "b9_dedup_extend_geo_full_over_half": geo_text_ratio,
                    "b9_dedup_extend_geo_pair_ratios": geo_text_ratios,
                    # the r8 64-doc daily batch vs the whole-corpus
                    # one-shot re-run it replaces (same interleaving)
                    "b9_dedup_extend_over_full_rerun": text_rerun_ratio,
                    "b9_dedup_extend_rerun_pair_ratios": text_rerun_ratios,
                    # r9: the embedding family under the same protocol
                    "b9_emb_dedup_extend_full_over_half": geo_emb_ratio,
                    "b9_emb_dedup_extend_geo_pair_ratios": geo_emb_ratios,
                    "b9_emb_dedup_extend_over_full_rerun": emb_rerun_ratio,
                    "b9_emb_dedup_extend_rerun_pair_ratios": emb_rerun_ratios,
                    # r11: extend wall cost vs commit-log depth (~flat =
                    # the metadata plane resolves O(tail), VERDICT r10
                    # weak #1 closed)
                    "b11_extend_deep_over_shallow_log": b11_depth_ratio,
                    "b11_extend_log_depth_pair_ratios": b11_depth_ratios,
                    # r11: a 20-commit-lagged CDC poll vs the full log
                    # walk it replaced, same ~20k-commit log (≪1 =
                    # polls read O(lag), not O(history))
                    "b11_cdc_poll_over_deep_full_walk": b11_poll_ratio,
                    "b11_cdc_poll_pair_ratios": b11_poll_ratios,
                    "b12_resolve_archived_over_unarchived": _ratio(
                        "b12_resolve_deep_log_archived",
                        "b12_resolve_deep_log_unarchived",
                    ),
                    "b12_archived_commits": _b12_out["archived"],
                    "b12_cluster_fold_1024_over_64shards": b12c_ratio,
                    "b12_cluster_fold_pair_ratios": b12c_ratios,
                    # r13: steady-state archival — resolution cost and
                    # listing size as the log grows 10x through N
                    # incremental chunked archival runs (~flat = O(live
                    # tail + chunks), the r12 one-shot claim as a curve)
                    "b13_resolve_10x_over_1x": _ratio(
                        "b13_resolve_after_10x_growth",
                        "b13_resolve_at_first_stage",
                    ),
                    "b13_commits_curve": b13_commits_curve,
                    "b13_resolve_curve": b13_resolve_curve,
                    "b13_dirents_curve": b13_dirents_curve,
                    "b13_chunks_curve": b13_chunks_curve,
                    # r14: wide-table metadata plane (docs/scale.md
                    # 'wide-table reads') and group-consistent resolve
                    # overhead vs two independent pinned resolves
                    # (interleaved pair; ~1.0 = group consistency free)
                    "b14_live_paths_us_per_partition": b14_us_per_partition,
                    "b14_group_over_independent_resolve": b14_group_ratio,
                    "b14_group_resolve_pair_ratios": b14_group_ratios,
                },
                "ann_probe_read_fraction": ann_probe_read_fraction,
                "ann_locate_read_fraction": ann_locate_read_fraction,
                "dedup_band_read_fraction": dedup_band_read_fraction,
                "emb_dedup_band_read_fraction": emb_dedup_band_read_fraction,
                "simhash_band_read_fraction": simhash_band_read_fraction,
                "cluster_fold_read_fraction": cluster_fold_read_fraction,
                "cluster_fold_read_fraction_200pairs": (
                    cluster_fold_read_fraction_200pairs
                ),
                "cluster_fold_read_fraction_100pairs_1024shards": (
                    cluster_fold_read_fraction_100pairs_1024shards
                ),
            }
        )
    print(payload)
    # persist the contract line to a file too (atomic rename): a truncated
    # stdout capture erased round 13's entire round-over-round comparison,
    # so the file is the durable copy — stdout stays the primary contract
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json"),
    )
    try:
        tmp_path = out_path + ".tmp"
        with open(tmp_path, "w") as f:
            f.write(payload + "\n")
        os.replace(tmp_path, out_path)
    except OSError as e:
        print(f"[bench] could not persist {out_path}: {e}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
