"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship versioned-lake slice on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 (plus
the training-data pipeline operators); each callable (spark, sf_dir) → DataFrame.
``oracle_sql()`` — equivalent ANSI SQL for DuckDB on the same parquet views.

Column names are aliased identically on both sides; SQL texts avoid
backslash escapes and dialect-specific types so many texts run unchanged
on both engines (see chronicles_spark/plans/synthetic_log.py docstring).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from chronicles_spark.core.model import (
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.functions.strings import (
    VERSION_LABEL_RE,
    base_path_of,
    hive_partition_expr,
    partition_of_path,
    version_label_parts,
    version_of_path,
)
from chronicles_spark.plans import log_queries as LQ
from chronicles_spark.plans.synthetic_log import LOG_CTE, head_ref_df, ops_log_df
from chronicles_spark.sources import load_table, register_views
from chronicles_spark.spark import (
    compact_partitions,
    read_changes,
    read_current,
    versioned_insert_into,
)
from chronicles_spark.spark.reader import (
    read_at_commit,
    read_at_tag,
    read_at_timestamp,
)
from chronicles_spark.trackers import FileBackedVersionTracker
from chronicles_spark.operators import (
    dedup as DD,
    multimodal as MM,
    similarity as SIM,
    text as TX,
)

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Versioned-lake slice (SURVEY §7 phase 2): init a date-partitioned
    versioned table from sf0.001 events, write all partitions, overwrite one
    partition with reprocessed data, then aggregate over the current view —
    proves write/commit/fold/read end-to-end."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmp = tempfile.mkdtemp(prefix="chronicles_entry_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "events"), tmp + "/events", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="entry")

    events = load_table(spark, SF0001, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    versioned_insert_into(events, table, tracker, "entry", "initial load")
    # reprocess one partition (same rows, fresh version — overwrite semantics)
    reprocessed = events.where(F.col("event_date") == "2024-01-05")
    versioned_insert_into(reprocessed, table, tracker, "entry", "reprocess 2024-01-05")

    view = read_current(spark, table, tracker)
    return (
        view.groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# shared SQL fragments (dialect-neutral: Spark SQL + DuckDB)

# deterministic version labels derived from event dates (md5 → uuid shape)
LBL_CTE = """
WITH built AS (
  SELECT d,
    replace(d, '-', '') || '-120000.000000000-' ||
    substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4) || '-' ||
    substr(h, 17, 4) || '-' || substr(h, 21, 12) AS label
  FROM (
    SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS d,
           md5(CAST(CAST(ts AS DATE) AS STRING)) AS h
    FROM events
  ) x
)
"""

# labels PLUS hive partition strings per distinct (date, event_type) —
# the round-9 merged fixture for q_version_parse (V11 label parsing +
# V12 partition parsing on one row set)
LBL_PART_CTE = """
WITH built AS (
  SELECT d, event_type,
    replace(d, '-', '') || '-120000.000000000-' ||
    substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4) || '-' ||
    substr(h, 17, 4) || '-' || substr(h, 21, 12) AS label,
    'event_date=' || d || '/event_type=' || event_type AS part_str
  FROM (
    SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS d, event_type,
           md5(CAST(CAST(ts AS DATE) AS STRING)) AS h
    FROM events
  ) x
)
"""

_FOLD_INNER = """
  SELECT part, version FROM (
    SELECT o.part, o.version, o.operation_type,
           ROW_NUMBER() OVER (
             PARTITION BY o.part
             ORDER BY o.sequence_id DESC, o.index_in_commit DESC) AS rk
    FROM ops_log o {join_head}
    WHERE o.table_name = 'demo.events' {cutoff}
      AND o.operation_type IN ('add_part_version', 'remove_part')
  ) f
  WHERE rk = 1 AND operation_type = 'add_part_version'
"""

FOLD_AT_HEAD = _FOLD_INNER.format(
    join_head="JOIN head_ref h ON o.table_name = h.table_name",
    cutoff="AND o.sequence_id <= h.head_seq",
)
FOLD_LATEST = _FOLD_INNER.format(join_head="", cutoff="")


def _mk_lbl_paths_sql(path_prefix: str) -> str:
    return LBL_CTE + (
        ", paths AS (SELECT d, label, '"
        + path_prefix
        + "' || d || '/_version=' || label AS path FROM built)"
    )


# ---------------------------------------------------------------------------
# versioned-write helpers for the roundtrip/time-travel queries


_VERSIONED_EVENTS_CACHE: dict = {}
_LOG_READ_CACHE: dict = {}


def _log_read_fixture(sf_dir: str = "shared"):
    """Tracker-only fixture for q_log_json_read: a 40-commit log whose
    older half is archived into several size-capped chunk artifacts
    (4 KiB cap), so the distributed read exercises BOTH the live-glob
    and the archived-chunk legs.  Independent of the shared
    `_write_versioned_events` fixture so archiving here never perturbs
    the other lifecycle rows' memoized state.

    Round 14 (VERDICT r13 #2 — the row gained a DuckDB oracle): the
    fixture is sf-INDEPENDENT (purely synthetic log), so it is built
    ONCE at a fixed path and published atomically via rename — the
    oracle SQL embeds this path in its ``read_json`` calls, and the
    atomic publish guarantees the Spark query and the DuckDB oracle
    read the SAME bytes even when evaluated by different processes
    (the loser of a concurrent-build rename race discards its staging
    copy and reuses the winner's)."""
    import os
    import shutil

    if _LOG_READ_CACHE:
        return next(iter(_LOG_READ_CACHE.values()))
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version

    table = TableName("demo", "logread")
    base = os.path.join(tempfile.gettempdir(), "chronicles_logread_f3")
    if not os.path.isdir(base):
        stage_root = tempfile.mkdtemp(prefix="chronicles_logread_build_")
        stage = os.path.join(stage_root, "log")
        tracker = FileBackedVersionTracker(stage, checkpoint_interval=5)
        tracker.init_table(table, is_snapshot=False, user_id="q")
        for i in range(40):
            tracker.commit(
                table,
                TableUpdate(
                    TableUpdateMetadata.new("q", f"w{i}"),
                    (AddPartitionVersion(
                        Partition.of(("p", str(i % 8))), generate_version()
                    ),),
                ),
            )
        out = tracker.archive_commits(
            table, retain_checkpoints=1, max_chunk_bytes=4096
        )
        if len(out["archives"]) < 2:
            raise AssertionError(
                "log-read fixture expected several archive chunks, got "
                f"{out['archives']}"
            )
        try:
            os.rename(stage, base)
        except OSError:
            pass  # a concurrent build won the publish: use theirs
        shutil.rmtree(stage_root, ignore_errors=True)
    tracker = FileBackedVersionTracker(base, checkpoint_interval=5)
    _LOG_READ_CACHE["shared"] = (table, tracker)
    return table, tracker


def _write_versioned_events(spark: SparkSession, sf_dir: str):
    """Write events as a versioned table: v1 = all partitions, then one
    partition overwritten with identical data (fresh version). Returns
    (table, tracker, first_commit_id).

    Memoized per ``sf_dir``: the fixture is immutable once built (every
    consumer reads it or dry-runs vacuum), so the lifecycle queries
    (q_versioned_write_roundtrip, q_time_travel_read, q_read_changes,
    q_vacuum_dry_run, q_log_json_read) time the operator under test, not
    repeated fixture construction.

    Round 5: the tracker is constructed with ``checkpoint_interval=2`` so
    a fold checkpoint is actually WRITTEN during the fixture build and
    READ by every driver-checked consumer — the production O(tail)
    resolution path (trackers/files.py ``_fast_resolve``) is on the
    driver-hash-checked path, not only in pytest.  The fixture asserts
    (a) a ``checkpoint_*.json`` artifact exists, and (b) the checkpointed
    resolution is identical to a full-fold ground-truth tracker
    (``checkpoint_interval=None`` disables checkpoint reads as well as
    writes) over the same log directory."""
    if sf_dir in _VERSIONED_EVENTS_CACHE:
        return _VERSIONED_EVENTS_CACHE[sf_dir]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmp = tempfile.mkdtemp(prefix="chronicles_q_")
    tracker = FileBackedVersionTracker(tmp + "/_log", checkpoint_interval=2)
    table = TableDefinition(
        TableName("demo", "events"), tmp + "/events", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    versioned_insert_into(events, table, tracker, "q", "v1 load")
    first_commit = tracker.table_state(table.name).current_version
    redo = events.where(F.col("event_date") == "2024-01-05")
    versioned_insert_into(redo, table, tracker, "q", "overwrite 2024-01-05")

    # correctness gate: the checkpoint must exist AND the checkpointed
    # fast path must agree with the full fold (and with time travel to
    # the first commit) before any driver row reads through it
    tdir = tracker.fs.join(
        tracker.root, f"_chronicles_table_{table.name.fully_qualified}"
    )
    ckpts = [n for n in tracker.fs.list_dir(tdir) if n.startswith("checkpoint_")]
    if not ckpts:  # pragma: no cover - correctness gate
        raise AssertionError("lifecycle fixture wrote no fold checkpoint")
    truth = FileBackedVersionTracker(tmp + "/_log", checkpoint_interval=None)
    if tracker.current_version(table.name) != truth.current_version(table.name) or (
        tracker.version_at(table.name, first_commit)
        != truth.version_at(table.name, first_commit)
    ):  # pragma: no cover - correctness gate
        raise AssertionError("checkpointed fold diverged from full fold")
    _VERSIONED_EVENTS_CACHE[sf_dir] = (table, tracker, first_commit)
    return table, tracker, first_commit


_WAP_GATE_CACHE: dict = {}


def _wap_restore_gate(spark: SparkSession, sf_dir: str) -> None:
    """Correctness gate for the round-4 lifecycle extensions, asserted on a
    tiny dedicated table (never the shared fixture): schema-guarded
    writes (spark/schema_guard.py), branch create → staged write → WAP
    merge (branching.py), and partition restore (spark/restore.py).
    Raises on any divergence; memoized per sf_dir so the shared-fixture
    queries keep timing only their own operator."""
    if sf_dir in _WAP_GATE_CACHE:
        return
    from chronicles_spark import branching as B
    from chronicles_spark.spark import restore_partitions
    from chronicles_spark.spark.schema_guard import SchemaDriftError

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmp = tempfile.mkdtemp(prefix="chronicles_wap_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "wap"), tmp + "/wap", PartitionSchema(("d",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    seed = spark.range(8).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("d")
    )
    versioned_insert_into(seed, table, tracker, "q", "seed", schema_mode="additive")
    good_head = tracker.table_state(table.name).current_version

    # schema guard: a type change must be rejected BEFORE any bytes land
    try:
        versioned_insert_into(
            seed.withColumn("id", F.col("id").cast("string")),
            table, tracker, "q", "drift", schema_mode="additive",
        )
        raise AssertionError("schema guard accepted a type change")
    except SchemaDriftError:
        pass

    # WAP: stage an overwrite of d=1 on a branch; main must not see it
    B.create_branch(tracker, table.name, "stage", "q", location=table.location)
    bdef = B.branch_table_def(table, "stage")
    staged = spark.range(100, 104).select(F.col("id"), F.lit("1").alias("d"))
    versioned_insert_into(staged, bdef, tracker, "q", "staged")
    if read_current(spark, table, tracker).where(F.col("id") >= 100).count():
        raise AssertionError("staged branch write leaked into main")
    B.merge_branch(table, tracker, "stage", "q", "publish", drop_branch=True)
    merged = read_current(spark, table, tracker)
    if merged.where(F.col("id") >= 100).count() != 4 or merged.count() != 8:
        raise AssertionError("WAP merge did not publish the staged partition")

    # restore: re-point d=1 at its pre-merge state; view returns to seed
    restore_partitions(
        table, tracker,
        [Partition.of(("d", "1"))],
        "q", "undo publish", at_commit=good_head,
    )
    back = read_current(spark, table, tracker)
    if back.count() != 8 or back.where(F.col("id") >= 100).count() != 0:
        raise AssertionError("partition restore did not recover the seed state")

    # cross-table group commit (spark/writer.py versioned_insert_group):
    # two tables flip together under one group publish
    from chronicles_spark.spark import versioned_insert_group

    t2 = TableDefinition(
        TableName("demo", "wap2"), tmp + "/wap2", PartitionSchema(("d",))
    )
    tracker.init_table(t2.name, is_snapshot=False, user_id="q")
    states = versioned_insert_group(
        [(seed, table), (seed, t2)], tracker, "q", "group batch"
    )
    if set(states) != {table.name, t2.name} or read_current(
        spark, t2, tracker
    ).count() != 8:
        raise AssertionError("group commit did not publish both tables")

    # round-12 extensions, on the same fixture log:
    # (1) timestamp time travel: the mid-history good_head commit must
    #     resolve by ITS OWN timestamp to the same folded state as the
    #     commit-id read gated above (trackers/base.py
    #     commit_at_timestamp — backward log-order scan)
    st = tracker.table_state(table.name)
    good_meta = next(
        u.metadata for u in st.updates if u.metadata.commit_id == good_head
    )
    want_state = tracker.version_at(table.name, good_head)
    resolved = tracker.commit_at_timestamp(table.name, good_meta.timestamp)
    if tracker.version_at(table.name, resolved) != want_state:
        raise AssertionError(
            "commit_at_timestamp resolved a different table state than "
            "the commit-id read"
        )
    # (2) commit-log archival (trackers/files.py archive_commits): pack
    #     the fixture's history behind a checkpoint and every answer
    #     above must survive byte-identically — the current view, the
    #     full log, deep commit-id travel AND deep timestamp travel now
    #     read through the archive.  Round 13: the tiny max_chunk_bytes
    #     forces MULTIPLE size-capped chunk artifacts, so the chunked
    #     format (name-carried bounds, ranged chunk pruning, summed
    #     listing counts) is what this gate reads through.
    ck_tr = FileBackedVersionTracker(tmp + "/_log", checkpoint_interval=2)
    pre_cv = ck_tr.current_version(table.name)
    pre_ids = [u.metadata.commit_id for u in st.updates]
    ck_tr._maybe_checkpoint(ck_tr._table_dir(table.name))  # cut at head
    out = ck_tr.archive_commits(
        table.name, retain_checkpoints=0, max_chunk_bytes=4096
    )
    if not out["archived"]:
        raise AssertionError("archive_commits packed nothing on a deep log")
    import re as _re

    if not out["archives"] or not all(
        _re.match(r"^archive_\d{13}-\d{13}_\d{8}_[0-9a-f]{8}\.json$", a)
        for a in out["archives"]
    ):
        raise AssertionError(
            "archive artifacts must carry (first_seq-last_seq, n, crc) "
            f"chunk names, got {out['archives']}"
        )
    post = ck_tr.table_state(table.name)
    if (
        ck_tr.current_version(table.name) != pre_cv
        or [u.metadata.commit_id for u in post.updates] != pre_ids
        or ck_tr.version_at(table.name, good_head) != want_state
        or ck_tr.version_at(
            table.name, ck_tr.commit_at_timestamp(table.name, good_meta.timestamp)
        ) != want_state
    ):
        raise AssertionError(
            "commit-log archival changed an answer (current view, log "
            "identity, or deep time travel)"
        )
    back2 = read_current(spark, table, ck_tr)
    if back2.count() != 8 or back2.where(F.col("id") >= 100).count() != 0:
        raise AssertionError("post-archival read diverged from the live view")
    _WAP_GATE_CACHE[sf_dir] = True


_PQ_GATE_CACHE: dict = {}


def _pq_gate(spark: SparkSession, sf_dir: str) -> None:
    """Correctness gate for the product-quantization family (riding the
    rows-only q_ann_ivf_kmeans row — same learned-codebook family):
    deterministic invariants that any regression in fit/encode/decode/ADC
    breaks.  Exact-value differentials vs numpy are in tests/test_pq.py;
    this keeps the family driver-visible.  Memoized per sf_dir."""
    if sf_dir in _PQ_GATE_CACHE:
        return
    emb = load_table(spark, sf_dir, "embeddings")
    m, k_sub = 4, 4
    books = SIM.pq_fit(emb, m=m, k_sub=k_sub, iters=2, train_fraction=0.5)
    if len(books) != m or any(len(cb) != k_sub for cb in books):
        raise AssertionError("pq_fit returned a malformed codebook")
    codes = SIM.pq_encode(emb, books)
    bad = codes.where(
        (F.size("pq_codes") != m)
        | F.exists("pq_codes", lambda c: (c < 0) | (c >= k_sub))
    ).count()
    if bad:
        raise AssertionError(f"pq_encode produced {bad} out-of-range code rows")
    # reconstruction must beat the global-mean baseline (the compression
    # claim), computed with the same fold arithmetic on both sides
    v = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    joined = v.join(SIM.pq_decode(codes, books), "vec_id")
    sq = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    dim = len(books[0][0]) * m
    # per-dim aggregate columns instead of posexplode (the _lloyd_step
    # shape); min/max(size) ride the same job to keep the old
    # dimension-mismatch strictness
    grow = v.agg(
        F.min(F.size("v")).alias("dmin"),
        F.max(F.size("v")).alias("dmax"),
        *[F.avg(F.element_at("v", p + 1)).alias(f"m{p}") for p in range(dim)],
    ).collect()[0]
    gmean = [grow[f"m{p}"] for p in range(dim)]
    if grow["dmin"] != dim or grow["dmax"] != dim or any(x is None for x in gmean):
        raise AssertionError("dimension mismatch in PQ gate")
    gl = SIM._lit_array(gmean)  # one parsed array-literal node
    errs = joined.agg(
        F.sum(sq(F.col("v"), F.col("v_approx"))).alias("e_pq"),
        F.sum(sq(F.col("v"), gl)).alias("e_mean"),
    ).collect()[0]
    if not errs["e_pq"] < errs["e_mean"]:
        raise AssertionError(
            f"PQ reconstruction ({errs['e_pq']}) no better than the "
            f"global-mean baseline ({errs['e_mean']})"
        )
    # ADC: k ranked rows per query, ranks contiguous, distances ascending
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    adc = SIM.pq_adc_topk(codes, queries, books, k=3).collect()
    per_q: dict = {}
    for r in adc:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["adc_dist"]))
    for qid, rows in per_q.items():
        rows.sort()
        if [r for r, _ in rows] != [1, 2, 3]:
            raise AssertionError(f"ADC ranks not contiguous for query {qid}")
        ds = [d for _, d in rows]
        if ds != sorted(ds):
            raise AssertionError(f"ADC distances not ascending for query {qid}")
    if set(per_q) != {0, 1, 2}:
        raise AssertionError("ADC missing a query")

    # composed IVF+PQ search: with EVERY bucket probed and the SAME
    # fitted codebooks injected it must return the flat ADC ranking —
    # neighbors compared exactly, distances with a 1e-6 tolerance
    # (the two paths sum the m per-subspace terms under different
    # join/partitioning shapes, so last-ulp summation-order noise is
    # expected; exact float equality here would be a flake)
    queries2 = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    flat = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in SIM.pq_adc_topk(codes, queries2, books, k=3).collect()
    }
    composed = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_dist"])
        for r in SIM.ivfpq_topk(
            emb, queries2, k=3, n_clusters=4, n_probe=4, m=m, k_sub=k_sub,
            iters=2, train_fraction=0.5, codebooks=books,
        ).collect()
    }
    if set(composed) != set(flat):
        raise AssertionError("ivfpq_topk rank keys diverged from flat ADC")
    for key, (nb, dist) in composed.items():
        fnb, fdist = flat[key]
        if nb != fnb or abs(dist - fdist) > 1e-6:
            raise AssertionError(
                f"ivfpq_topk with all buckets probed diverged from flat "
                f"ADC at {key}: ({nb}, {dist}) vs ({fnb}, {fdist})"
            )

    # exact re-rank (rerank_topk — the IVFPQ+refine recipe's refine step):
    # over a shortlist covering the WHOLE corpus (ADC k >= corpus size)
    # the re-ranked cosine top-k, minus the trivial self-match, must equal
    # brute_topk's exact answer — any approximation leaking through the
    # re-rank (or a broken tie-break) diverges here
    n_corpus = emb.count()
    shortlist = SIM.pq_adc_topk(codes, queries2, books, k=n_corpus)
    rr = SIM.rerank_topk(
        shortlist.where(F.col("neighbor_id") != F.col("query_id")),
        emb, queries2, k=3, metric="cosine",
    )
    got_rr = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in rr.collect()
    }
    want_rr = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in SIM.brute_topk(
            emb, emb.select("vec_id").where(F.col("vec_id") < 3), k=3
        ).collect()
    }
    if got_rr != want_rr:
        raise AssertionError(
            f"rerank_topk over a full shortlist diverged from brute_topk: "
            f"{got_rr} vs {want_rr}"
        )

    # materialized ANN index (operators/ann_index.py — round 6): the
    # encoded corpus written as a versioned table partitioned by bucket.
    # Two assertions with teeth: (a) the indexed search is byte-identical
    # to the in-memory ivfpq_topk under the same artifacts; (b) the probe
    # read's input files lie ENTIRELY under the probed buckets' live
    # directories — the scan-level pruning claim, checked on real paths.
    from chronicles_spark.operators import ann_index as AX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmpa = tempfile.mkdtemp(prefix="chronicles_ann_")
    atracker = FileBackedVersionTracker(tmpa + "/_log")
    atable = TableDefinition(
        TableName("demo", "ann_idx"), tmpa + "/ann", PartitionSchema(("bucket",))
    )
    atracker.init_table(atable.name, is_snapshot=False, user_id="q")
    astate, arts = AX.build_ann_index(
        emb, atable, atracker, n_clusters=4, iters=2, codebooks=books
    )
    idx = sorted(map(tuple, AX.ivfpq_topk_indexed(
        spark, atable, atracker, queries2, k=3, n_probe=2
    ).collect()))
    mem = sorted(map(tuple, SIM.ivfpq_topk(
        emb, queries2, k=3, n_probe=2,
        centroids=arts.centroid_list, codebooks=arts.codebook_list,
    ).collect()))
    if idx != mem or not idx:
        raise AssertionError(
            f"indexed ANN search diverged from in-memory ivfpq_topk: "
            f"{idx[:3]}... vs {mem[:3]}..."
        )
    probes1 = SIM.select_probes(queries2, arts.centroid_list, 1)
    probed1 = sorted(
        r["bucket"] for r in probes1.select("bucket").distinct().collect()
    )
    allowed = AX.probed_bucket_paths(atable, astate, probed1)
    res1 = AX.ivfpq_topk_indexed(
        spark, atable, atracker, queries2, k=3, n_probe=1
    )
    files1 = [
        f.removeprefix("file://")
        for f in res1.inputFiles()
        if atable.location in f.removeprefix("file://")
    ]
    if not files1 or not all(
        any(f.startswith(a) for a in allowed) for f in files1
    ):
        raise AssertionError(
            f"probe read touched files outside the probed buckets: "
            f"{files1} vs allowed {allowed}"
        )
    live_buckets = sorted(
        dict(p.column_values)["bucket"]
        for p in astate.partition_versions.keys()
    )
    if len(live_buckets) > len(probed1) and not (
        len(AX.probed_bucket_paths(atable, astate, live_buckets)) > len(allowed)
    ):
        raise AssertionError("scan pruning audit: probed set not a strict subset")

    # incremental extend (upsert, round 6): re-submit id 0 carrying id 7's
    # embedding — the moved-upsert invariants: total count stable, no
    # stale twin of the moved id anywhere, and its codes now equal the
    # donor's (tests/test_ann_index.py pins the full bucket/Remove
    # semantics; this keeps the operator driver-visible)
    donor_vec = emb.where(F.col("vec_id") == 7).select(
        "embedding"
    ).collect()[0]["embedding"]
    moved = spark.createDataFrame(
        [(0, list(donor_vec))], "vec_id long, embedding array<float>"
    )
    n_idx = read_current(spark, atable, atracker).count()
    AX.extend_ann_index(moved, atable, atracker)
    after_ext = read_current(spark, atable, atracker)
    if after_ext.count() != n_idx:
        raise AssertionError("extend_ann_index upsert changed the row count")
    pair = {
        r["vec_id"]: list(r["pq_codes"])
        for r in after_ext.where(F.col("vec_id").isin(0, 7)).collect()
    }
    if len(
        after_ext.where(F.col("vec_id") == 0).collect()
    ) != 1 or pair[0] != pair[7]:
        raise AssertionError(
            "extend_ann_index upsert left a stale or mis-encoded row"
        )

    # round 7: the companion id map (bounded O(batch) upsert locate) must
    # agree with the index after the build AND after the moved upsert —
    # verify_ann_id_map is the full differential (id-by-id bucket match)
    if AX.verify_ann_id_map(spark, atable, atracker).count():
        raise AssertionError(
            "ann id map diverged from its index after build+extend"
        )

    # round 7: recall measurement — at exhaustive settings (every bucket
    # probed, shortlist covering the corpus) the indexed search pipeline
    # must recover the exact answer, recall == 1.0 exactly; numpy
    # differentials at approximate settings live in tests/test_ann_id_map
    rec = AX.ann_recall_at_k(
        spark, atable, atracker, queries2, emb, k=3,
        n_probes=(4,), shortlist_k=n_corpus,
    ).collect()
    if len(rec) != 1 or rec[0]["recall"] != 1.0:
        raise AssertionError(
            f"ann_recall_at_k at exhaustive settings must be 1.0, got {rec}"
        )

    # semantic dedup (same learned-centroid family; numpy differential in
    # tests/test_semantic_dedup.py) — invariant sweep: pairs exist on this
    # fixture, are ordered, and carry in-range cosines
    pairs = DD.semantic_dedup(
        emb, dim=_EMB_DIM, n_clusters=6, iters=2, threshold=0.35,
        max_cluster_size=10**9,
    ).collect()
    if not pairs:
        raise AssertionError("semantic_dedup found no pairs on the fixture")
    for r in pairs:
        if not (r["id_a"] < r["id_b"] and 0.35 <= r["cosine"] <= 1.0):
            raise AssertionError(f"semantic_dedup bad pair {r}")
    _PQ_GATE_CACHE[sf_dir] = True


_ANN_IDX_CACHE: dict = {}


def _ann_index_fixture(spark: SparkSession, sf_dir: str):
    """Materialized ANN index (operators/ann_index.py) built under
    DETERMINISTIC iters=0 artifacts — centroids = the 4 lowest-id vectors
    (kmeans_fit's documented init), codebooks = their subvector slices
    (the q_emb_transform precedent) — so the whole build+search path is
    SQL-reproducible and can carry a hash-checked driver row.  Built with
    the companion id map (id_map_shards=8) so the round-7 locate
    machinery is exercised and gated (verify_ann_id_map must be empty)
    on the driver-visible path.  Memoized per sf_dir."""
    if sf_dir in _ANN_IDX_CACHE:
        return _ANN_IDX_CACHE[sf_dir]
    from chronicles_spark.operators import ann_index as AX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="chronicles_qidx_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "ann_q"), tmp + "/ann", PartitionSchema(("bucket",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    cents0 = SIM.kmeans_fit(emb, 4, iters=0)
    books0 = SIM.pq_fit(emb, m=4, k_sub=4, iters=0)
    AX.build_ann_index(
        emb, table, tracker, centroids=cents0, codebooks=books0,
        id_map_shards=8,
    )
    if AX.verify_ann_id_map(spark, table, tracker).count():
        raise AssertionError(
            "ann id map inconsistent with its freshly built index"
        )
    _ANN_IDX_CACHE[sf_dir] = (table, tracker)
    return table, tracker


_DEDUP_IDX_CACHE: dict = {}


def _dedup_index_fixture(spark: SparkSession, sf_dir: str):
    """Incremental dedup index (operators/dedup_index.py) built over the
    CORPUS slice (doc_id % 5 != 0) of the documents table; the
    q_dedup_incremental row then extends it with the remaining fifth
    (the "daily crawl dump") and returns the verified pairs.  Same
    MinHash geometry as the one-shot q_dedup_minhash_lsh row, so the
    DuckDB oracle is the SAME CTE chain restricted to pairs touching
    the batch.  Memoized per sf_dir; the row's extend is an idempotent
    upsert, so repeated driver/bench invocations return identical
    values."""
    if sf_dir in _DEDUP_IDX_CACHE:
        return _DEDUP_IDX_CACHE[sf_dir]
    from chronicles_spark.operators import dedup_index as DX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="chronicles_qdedup_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "dedup_q"), tmp + "/bands",
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    DX.build_dedup_index(
        docs.where("doc_id % 5 != 0"), table, tracker,
        bands=_MINHASH_BANDS, rows=_MINHASH_ROWS,
        band_shards=16, doc_shards=8,
    )
    _DEDUP_IDX_CACHE[sf_dir] = (table, tracker)
    return table, tracker


_EMB_DEDUP_IDX_CACHE: dict = {}


def _emb_dedup_index_fixture(spark: SparkSession, sf_dir: str):
    """Incremental EMBEDDING dedup index (operators/emb_dedup_index.py —
    the dedup_index family core with a sign-LSH bander and exact-cosine
    verifier) built over the corpus slice (vec_id % 5 != 0) of the
    embeddings table; the q_dedup_emb_incremental row then extends it
    with the remaining fifth and returns the verified pairs.  Same
    hyperplane geometry as the one-shot q_dedup_embedding row, so the
    DuckDB oracle is the SAME sign-LSH CTE chain restricted to pairs
    touching the batch.  Memoized per sf_dir; the row's extend is an
    idempotent upsert."""
    if sf_dir in _EMB_DEDUP_IDX_CACHE:
        return _EMB_DEDUP_IDX_CACHE[sf_dir]
    from chronicles_spark.operators import emb_dedup_index as EX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = tempfile.mkdtemp(prefix="chronicles_qembdedup_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "emb_dedup_q"), tmp + "/bands",
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    EX.build_embedding_dedup_index(
        emb.where("vec_id % 5 != 0"), table, tracker, dim=_EMB_DIM,
        n_planes=_EMB_LSH_PLANES, bands=_EMB_LSH_BANDS,
        band_shards=16, doc_shards=8,
    )
    _EMB_DEDUP_IDX_CACHE[sf_dir] = (table, tracker)
    return table, tracker


_CLUSTER_IDX_CACHE: dict = {}


def _cluster_idx_fixture(spark: SparkSession, sf_dir: str):
    """Incremental duplicate-cluster index (operators/cluster_index.py)
    bootstrapped with HALF the corpus' verified minhash pairs folded as
    batch "fold-b0"; the q_dedup_clusters_incremental row then folds the
    other half (batch "fold-b1" — clusters straddling the split exercise
    the cross-batch merge path) and reads the assignment table back.
    Same pairs as the one-shot q_dedup_clusters row, so the DuckDB
    oracle is the SAME recursive-CTE connected-components chain — the
    fold-by-fold == one-shot differential IS the module's contract.
    Memoized per sf_dir; the folds carry batch labels, so repeated
    driver/bench invocations skip the already-folded batches (the
    journal watermark) and return identical values."""
    if sf_dir in _CLUSTER_IDX_CACHE:
        return _CLUSTER_IDX_CACHE[sf_dir]
    from chronicles_spark.operators import cluster_index as CX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs_all = DD.lineage_barrier(
        DD.minhash_dedup(
            docs, bands=_MINHASH_BANDS, rows=_MINHASH_ROWS,
            threshold=_JACCARD_THRESHOLD,
        ).select("id_a", "id_b")
    )
    tmp = tempfile.mkdtemp(prefix="chronicles_qclusters_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "clusters_q"), tmp + "/assign",
        PartitionSchema(("doc_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    CX.build_dedup_clusters(
        None, table, tracker, doc_shards=8, cluster_shards=8
    )
    CX.extend_dedup_clusters(
        pairs_all.where("(id_a + id_b) % 2 = 0"), table, tracker,
        batch_label="fold-b0",
    )
    _CLUSTER_IDX_CACHE[sf_dir] = (table, tracker, pairs_all)
    return table, tracker, pairs_all


_COMPACT_PAIRS_GATE_CACHE: dict = {}


def _compact_pairs_gate(spark: SparkSession, sf_dir: str, pairs_all) -> None:
    """Round-12 (VERDICT r11 next #2): driver-visible correctness for
    journal compaction (operators/cluster_index.py compact_dedup_pairs),
    riding the green q_dedup_clusters_incremental row the house way.  On
    a dedicated journal + assignment pair (never the row's fixture — its
    hash must stay byte-identical): land the corpus' verified pairs as
    three journal batches, fold them all, compact, and assert (a) the
    journal's pair content is row-identical pre/post consolidation,
    (b) a subsequent fold_new_dedup_pairs is a no-op (folded- partitions
    are never fold candidates — the exactly-once contract), and (c) the
    paired-table audit stays empty.  A compaction regression turns the
    driver row red.  Memoized per sf_dir."""
    if sf_dir in _COMPACT_PAIRS_GATE_CACHE:
        return
    from chronicles_spark.operators import cluster_index as CX
    from chronicles_spark.operators.dedup_index import PAIRS_BATCH_COL
    from chronicles_spark.spark.reader import read_version

    tmp = tempfile.mkdtemp(prefix="chronicles_cpg_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    assign = TableDefinition(
        TableName("demo", "cpg_assign"), tmp + "/assign",
        PartitionSchema(("doc_shard",)),
    )
    pt = TableDefinition(
        TableName("demo", "cpg_pairs"), tmp + "/pairs",
        PartitionSchema((PAIRS_BATCH_COL,)),
    )
    tracker.init_table(assign.name, is_snapshot=False, user_id="q")
    tracker.init_table(pt.name, is_snapshot=False, user_id="q")
    CX.build_dedup_clusters(
        None, assign, tracker, doc_shards=4, cluster_shards=4
    )
    for i in range(3):
        rows = pairs_all.where(f"(id_a + id_b) % 3 = {i}").withColumn(
            PAIRS_BATCH_COL, F.lit(f"b{i}")
        )
        versioned_insert_into(rows, pt, tracker, "q", f"land b{i}")

    def journal_pairs():
        st = tracker.current_version(pt.name)
        return read_version(
            spark, pt, st, infer_partition_types=False
        ).select("id_a", "id_b")

    folded = CX.fold_new_dedup_pairs(spark, pt, assign, tracker)
    if sorted(folded) != ["b0", "b1", "b2"]:
        raise AssertionError(f"fold_new_dedup_pairs folded {folded}")
    pre = journal_pairs().localCheckpoint(eager=True)
    batch_value = CX.compact_dedup_pairs(spark, pt, assign, tracker)
    if not batch_value:
        raise AssertionError("compact_dedup_pairs found nothing to compact")
    post = journal_pairs()
    if pre.exceptAll(post).count() or post.exceptAll(pre).count():
        raise AssertionError(
            "journal compaction changed the pairs content"
        )
    if CX.fold_new_dedup_pairs(spark, pt, assign, tracker):
        raise AssertionError(
            "a consolidated (folded-) partition re-entered the fold path "
            "— exactly-once broken"
        )
    if CX.verify_dedup_clusters(spark, assign, tracker).count():
        raise AssertionError(
            "paired-table audit non-empty after journal compaction"
        )
    _COMPACT_PAIRS_GATE_CACHE[sf_dir] = True


_SIMHASH_IDX_GATE_CACHE: dict = {}


def _simhash_index_gate(spark: SparkSession, sf_dir: str) -> None:
    """Round-10 (VERDICT r9 missing #3): driver-visible correctness for
    the SimHash index family (operators/simhash_index.py), riding the
    green q_dedup_simhash_pairs row the `_pq_gate` way.  Over a small
    corpus slice: build the banded-fingerprint index on 4/5, extend with
    the remaining 1/5, and the extend's verified pairs must equal the
    one-shot simhash_near_dup_candidates (no skew cap — the index takes
    no cap) restricted to batch-endpoint pairs at the same hamming
    bound; the band table must re-derive exactly from the stored
    fingerprints afterwards.  The slice keeps the no-cap one-shot's
    hot-piece blowup bounded (the cap exists for corpus scale; the gate
    needs the uncapped contract).  Memoized per sf_dir.  A failure
    raises and turns the driver row red."""
    if sf_dir in _SIMHASH_IDX_GATE_CACHE:
        return
    from chronicles_spark.operators import simhash_index as SX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.where("doc_id < 400")
    tmp = tempfile.mkdtemp(prefix="chronicles_qsimidx_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "simidx_q"), tmp + "/bands",
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    SX.build_simhash_dedup_index(
        docs.where("doc_id % 5 != 0"), table, tracker,
        bits=32, bands=4, band_shards=8, doc_shards=4,
    )
    pairs, _, _ = SX.extend_simhash_dedup_index(
        docs.where("doc_id % 5 = 0"), table, tracker, max_hamming=6
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in DD.simhash_near_dup_candidates(docs, max_band_freq=None)
        .where("hamming <= 6 AND (id_a % 5 = 0 OR id_b % 5 = 0)")
        .collect()
    )
    if got != want:
        raise AssertionError(
            f"simhash index extend != one-shot re-run "
            f"({len(got)} vs {len(want)} pairs)"
        )
    if SX.verify_simhash_dedup_index(spark, table, tracker).count():
        raise AssertionError(
            "simhash index inconsistent with its fingerprint store "
            "after extend"
        )
    _SIMHASH_IDX_GATE_CACHE[sf_dir] = True


_SEMANTIC_IDX_GATE_CACHE: dict = {}


def _semantic_dedup_index_gate(spark: SparkSession, sf_dir: str) -> None:
    """Round-10 (VERDICT r9 missing #2, code half): the incremental
    SEMANTIC dedup index (operators/semantic_dedup_index.py — the
    SemDeDup recipe's k-means candidate generator with the centroids
    pinned in the sidecar, fourth instance of the family core), riding
    the q_ann_ivf_kmeans row (same learned-centroid family, same
    no-SQL-oracle reason).  Over a small embeddings slice: build on 4/5
    under deterministic centroids, extend the remaining 1/5, and the
    extend's verified pairs must equal the one-shot semantic_dedup
    under the SAME injected centroids (skew sub-buckets off) restricted
    to batch-endpoint pairs; the band table must re-derive exactly from
    the stored vectors afterwards.  Memoized per sf_dir."""
    if sf_dir in _SEMANTIC_IDX_GATE_CACHE:
        return
    from chronicles_spark.operators import semantic_dedup_index as SDX

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.where("vec_id < 400")
    cents = SIM.kmeans_fit(emb.where("vec_id % 5 != 0"), 4, iters=2)
    tmp = tempfile.mkdtemp(prefix="chronicles_qsemidx_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "semidx_q"), tmp + "/bands",
        PartitionSchema(("band_shard",)),
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    SDX.build_semantic_dedup_index(
        emb.where("vec_id % 5 != 0"), table, tracker, dim=_EMB_DIM,
        n_clusters=4, centroids=cents, band_shards=8, doc_shards=4,
    )
    pairs, _, _ = SDX.extend_semantic_dedup_index(
        emb.where("vec_id % 5 = 0"), table, tracker,
        threshold=_COSINE_DEDUP_THRESHOLD,
    )
    got = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6)) for r in pairs.collect()
    )
    want = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in DD.semantic_dedup(
            emb, dim=_EMB_DIM, n_clusters=4,
            threshold=_COSINE_DEDUP_THRESHOLD, centroids=cents,
            max_cluster_size=10**9,
        ).where("id_a % 5 = 0 OR id_b % 5 = 0").collect()
    )
    if got != want:
        raise AssertionError(
            f"semantic dedup index extend != one-shot re-run "
            f"({len(got)} vs {len(want)} pairs)"
        )
    if SDX.verify_semantic_dedup_index(spark, table, tracker).count():
        raise AssertionError(
            "semantic dedup index inconsistent with its vector store "
            "after extend"
        )
    _SEMANTIC_IDX_GATE_CACHE[sf_dir] = True


_COMPACT_CACHE: dict = {}


def _compact_fixture(spark: SparkSession, sf_dir: str):
    """Fragmented versioned events table (multi-file partitions) that has
    been compacted to one file per partition.  Kept SEPARATE from
    ``_write_versioned_events`` because the compaction COMMIT would mutate
    the shared lifecycle fixture's log.  Memoized per sf_dir."""
    if sf_dir in _COMPACT_CACHE:
        return _COMPACT_CACHE[sf_dir]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tmp = tempfile.mkdtemp(prefix="chronicles_qc_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "events_c"), tmp + "/events", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    events = (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.col("ts").cast("date").cast("string"))
        .repartition(4)  # fragment every partition into several files
    )
    versioned_insert_into(events, table, tracker, "q", "v1 fragmented")
    compact_partitions(spark, table, tracker, "q", files_per_partition=1)
    _COMPACT_CACHE[sf_dir] = (table, tracker)
    return table, tracker


_EVENTS_VIEW_COLS = ["event_id", "user_id", "event_type", "value", "event_date"]

_EVENTS_ORACLE = """
SELECT event_id, user_id, event_type, value,
       CAST(CAST(ts AS DATE) AS STRING) AS event_date
FROM events
"""




def _longify(df: DataFrame) -> DataFrame:
    """Cast int32 columns to long: DuckDB counts/len() are BIGINT, Spark
    size()/row_number() are int — align schemas for the oracle compare."""
    from pyspark.sql import types as T

    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.IntegerType):
            df = df.withColumn(f_.name, F.col(f_.name).cast("long"))
    return df


# ---------------------------------------------------------------------------
# DuckDB fragments for the pipeline operators (dialect: DuckDB list lambdas)

_DOCS_SHINGLES_CTE = """
WITH docs AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
        FROM documents) x
)
"""

_MINHASH_BANDS = 8
_MINHASH_ROWS = 2
_JACCARD_THRESHOLD = 0.5
_NGRAM_THRESHOLD = 0.4
_NGRAM_MAX_SHINGLE_FREQ = 100  # skew guard: shingle in f docs → f² join rows
_SIMHASH_MAX_BAND_FREQ = 200  # same guard for simhash band pieces
_COSINE_DEDUP_THRESHOLD = 0.4
_EMB_DIM = 64
_EMB_LSH_PLANES = 16
_SEMD_K = 8  # q_semantic_dedup: injected centroids = embeddings of vec_id < k
_EMB_LSH_BANDS = 4


def _minhash_sigs_sql(n: int) -> str:
    cols = ",\n    ".join(
        f"list_min(list_transform(shingles, s -> md5('{i}|' || s))) AS sig_{i}"
        for i in range(n)
    )
    return f"sigs AS (\n  SELECT doc_id,\n    {cols}\n  FROM docs WHERE len(shingles) > 0\n)"


def _lsh_bands_sql(bands: int, rows: int) -> str:
    pieces = []
    for b in range(bands):
        expr = " || '|' || ".join(f"sig_{b * rows + r}" for r in range(rows))
        pieces.append(
            f"SELECT doc_id, {b} AS band_id, md5({expr}) AS band_key FROM sigs"
        )
    return "bands AS (\n" + "\nUNION ALL\n".join(pieces) + "\n)"


_VERIFY_SQL = """
ex AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh
  FROM docs WHERE len(shingles) > 0
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter,
         min(sa.n_sh) AS n_a, min(sb.n_sh) AS n_b
  FROM cand c
  JOIN ex sa ON sa.doc_id = c.id_a
  JOIN ex sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
"""

def _mk_minhash_ctes() -> str:
    """Shared CTE chain for the MinHash oracle: shingles → signatures →
    LSH bands → candidate pairs → intersection counts (``inter``)."""
    return (
        _DOCS_SHINGLES_CTE
        + ", "
        + _minhash_sigs_sql(_MINHASH_BANDS * _MINHASH_ROWS)
        + ",\n"
        + _lsh_bands_sql(_MINHASH_BANDS, _MINHASH_ROWS)
        + """,
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
"""
        + _VERIFY_SQL
    )


_MINHASH_CTES = _mk_minhash_ctes()

_EMB_V_CTE = """
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
)
"""

_COS_SQL = (
    "round(list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])) / "
    "(sqrt(list_sum(list_transform({a}, x -> x * x))) * "
    "sqrt(list_sum(list_transform({b}, x -> x * x)))), 6)"
)


def _emb_lsh_sql(n_planes: int, bands: int, dim: int, threshold: float) -> str:
    """DuckDB twin of DD.embedding_lsh_dedup: same md5-derived hyperplanes,
    same banded candidate join, same exact-cosine verify."""
    from chronicles_spark.operators.similarity import hyperplane_signs

    planes = hyperplane_signs(n_planes, dim)
    r = n_planes // bands

    def bit_sql(plane: list[float]) -> str:
        lit = "[" + ",".join("1.0" if x > 0 else "-1.0" for x in plane) + "]"
        return (
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> v[i] * ({lit}::DOUBLE[])[i])) > 0 THEN '1' ELSE '0' END)"
        )

    band_selects = []
    for b in range(bands):
        key = " || ".join(bit_sql(planes[b * r + j]) for j in range(r))
        band_selects.append(
            f"SELECT vec_id, {b} AS band_id, {key} AS band_key FROM v"
        )
    bands_cte = "bands AS (\n" + "\nUNION ALL\n".join(band_selects) + "\n)"
    return (
        _EMB_V_CTE
        + ", "
        + bands_cte
        + """,
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT c.id_a, c.id_b, """
        + _COS_SQL.format(a="va.v", b="vb.v")
        + f""" AS cosine
  FROM cand c
  JOIN v va ON va.vec_id = c.id_a
  JOIN v vb ON vb.vec_id = c.id_b
) s
WHERE cosine >= {threshold}
"""
    )


def _log_json_oracle_sql() -> str:
    """DuckDB twin of q_log_json_read (VERDICT r13 #2): ``read_json``
    over the SAME live ``table_update_*.json`` files and ``archive_*``
    chunk artifacts the distributed ``commit_log_df`` read scans —
    column-for-column the schemas of spark/log_reader.py, with the
    archived/live split decided by which glob a row came from (exactly
    the reader's rule; the fixture has no crash-leftover duplicate
    slots, so plain UNION ALL mirrors the reader's no-dedup fast path).
    Building the SQL constructs (or reuses) the fixed-path fixture, so
    the text is valid whenever it runs."""
    table, tracker = _log_read_fixture()
    d = tracker._table_dir(table)
    op = (
        'STRUCT("type" VARCHAR, "partition" VARCHAR, version VARCHAR, '
        "table_name VARCHAR, is_snapshot BOOLEAN)"
    )
    return f"""
WITH live AS (
  SELECT commit_id, user_id, message, operations, FALSE AS archived
  FROM read_json('{d}/table_update_*.json',
    columns={{commit_id: 'VARCHAR', user_id: 'VARCHAR', message: 'VARCHAR',
             timestamp: 'VARCHAR', operations: '{op}[]'}})
),
arch0 AS (
  SELECT unnest(entries) AS e
  FROM read_json('{d}/archive_*.json',
    columns={{entries: 'STRUCT(s BIGINT, u STRUCT(commit_id VARCHAR,
             user_id VARCHAR, message VARCHAR, timestamp VARCHAR,
             operations {op}[]))[]'}})
),
arch AS (
  SELECT e.u.commit_id AS commit_id, e.u.user_id AS user_id,
         e.u.message AS message, e.u.operations AS operations,
         TRUE AS archived
  FROM arch0
),
allc AS (SELECT * FROM live UNION ALL SELECT * FROM arch)
SELECT commit_id, user_id, message, archived,
       CAST(i - 1 AS BIGINT) AS op_index,
       operations[i]."type" AS op_type,
       operations[i]."partition" AS "partition"
FROM allc, UNNEST(range(1, len(operations) + 1)) AS u(i)
"""


def _semantic_dedup_sql(k: int, dim: int, threshold: float) -> str:
    """DuckDB twin of DD.semantic_dedup under injected centroids
    (= the embeddings of the k lowest vec_ids): squared-L2 argmin
    assignment with ties to the lowest centroid id (_assign_nearest's
    exact tie-break), in-cluster pairs, round-6 cosine verify."""
    return (
        _EMB_V_CTE
        + f""",
c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < {k}),
d AS (
  SELECT v.vec_id, c.cid,
         list_sum(list_transform(range(1, {dim + 1}),
           i -> (v.v[i] - c.cv[i]) * (v.v[i] - c.cv[i]))) AS dist
  FROM v, c
),
assign AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cid ASC) AS rn
    FROM d
  ) r WHERE rn = 1
)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, """
        + _COS_SQL.format(a="va.v", b="vb.v")
        + f""" AS cosine
  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id
) s
WHERE cosine >= {threshold}
"""
    )


# ---------------------------------------------------------------------------
# queries
#
# DRIVER-CAP MERGE PLAN (the driver's correctness file caps at 50 rows;
# policy: hold at <= 49 so every declared query gets a row, keep one slot
# of margin).  Round-7 execution of the documented plan:
#   * q_token_count + q_quality_score MERGED into q_token_count (same
#     fixture, same single-scan shape; every column of both still
#     hash-checked) — freeing one slot;
#   * the freed slot is q_ann_index_search: the materialized ANN index
#     family's first HASH-CHECKED row (deterministic iters=0 artifacts,
#     full build→versioned-read→ADC ranking vs a DuckDB oracle), which
#     also exercises + gates the round-7 companion id map
#     (verify_ann_id_map inside the fixture);
#   * O(batch) upsert locate / skew guard / recall operator →
#     `_pq_gate` additions on q_ann_ivf_kmeans + pytest differentials
#     (tests/test_ann_id_map.py) — no new rows.
# Where each round-6 addition rides — NONE adds a row:
#   * materialized ANN index (build_ann_index / ivfpq_topk_indexed) →
#     `_pq_gate` on q_ann_ivf_kmeans (indexed-vs-in-memory equality +
#     scan-prune path audit);
#   * exact re-rank (rerank_topk)       → `_pq_gate` (full-shortlist
#     re-rank must equal brute_topk exactly);
#   * extended Gopher rules (4 new pass_* columns) → the hash-checked
#     q_repetition_signals row (same scan, map-side, oracle widened);
#   * CAS-mode streaming coverage → pytest only (lifecycle, no row).
# Round-8 curation (still 49 rows):
#   * q_fingerprint merged INTO q_lang_id (same documents scan, both
#     map-side projections; the merged oracle value-checks every
#     fingerprint column) — the freed slot carries
#     `q_dedup_incremental`, the incremental dedup index's hash-checked
#     row (operators/dedup_index.py; in-row verify_dedup_index gate);
#   * torn-pair refusal / pairing protocol → pytest crash-injection
#     (tests/test_ann_id_map.py, tests/test_dedup_index.py) — no row;
#   * skew-cap in-commit re-split / nested suffixes → pytest
#     (tests/test_ann_id_map.py hot-bucket suite) — no row.
# Round-9 curation (still 49 rows):
#   * q_partition_parse merged INTO q_version_parse (one synthetic
#     (label, part_str) fixture; every column of both still
#     hash-checked) — the freed slot carries `q_dedup_emb_incremental`,
#     the incremental EMBEDDING dedup index's hash-checked row
#     (operators/emb_dedup_index.py; in-row verify gate);
#   * exactly-once pairs journal / rebuild re-geometry / dedup sidecar
#     GC / dedup CLI verbs → pytest (tests/test_dedup_index.py,
#     tests/test_emb_dedup_index.py, tests/test_cli.py) — no rows.
# Round-10 curation (still 49 rows):
#   * q_mm_frame_sample merged INTO q_mm_decode_meta (per-frame grain
#     joined with the decode/meta columns; every column of both still
#     hash-checked) — the freed slot carries
#     `q_dedup_clusters_incremental`, the incremental duplicate-cluster
#     index's hash-checked row (operators/cluster_index.py; in-row
#     verify_dedup_clusters gate; oracle = the same recursive-CTE
#     connected components as q_dedup_clusters);
#   * SimHash index family gate (extend == one-shot + store audit) →
#     rides q_dedup_simhash_pairs (`_simhash_index_gate`) — no row;
#   * journal fold watermark / geometry-drift warning / pairs-name
#     ordering / dtype stability / CLI rebuild guards → pytest
#     (tests/test_cluster_index.py, tests/test_dedup_index.py,
#     tests/test_cli.py) — no rows.
# Round 13 executed the standing merge (q_ann_cosine_topk now carries
# both the brute-force and IVF contracts, tagged by `method`), so ONE
# driver slot is free.  If a future family needs a second row, the next
# nearest duplicates are q_top_ngrams + q_contamination (both n-gram
# fixtures over documents).


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- V: commit-log algebra (distributed DataFrame plans) ---------------

    def q_current_version_fold(spark, sf):
        return LQ.current_version_fold(
            ops_log_df(spark, sf), head_ref_df(spark, sf), "demo.events"
        )

    def q_compute_changes(spark, sf):
        ops = ops_log_df(spark, sf)
        cur = LQ.current_version_fold(ops, head_ref_df(spark, sf), "demo.events")
        tgt = LQ.current_version_fold(ops, None, "demo.events")
        return LQ.compute_changes_df(cur, tgt)

    def q_snapshot_version_fold(spark, sf):
        return LQ.snapshot_version_fold(
            ops_log_df(spark, sf), head_ref_df(spark, sf), "demo.users"
        )

    def q_updates_log(spark, sf):
        return LQ.updates_log(ops_log_df(spark, sf))

    def q_table_state_group(spark, sf):
        return LQ.table_state_group(ops_log_df(spark, sf))

    def q_tables_list(spark, sf):
        # V1 + V7 merged (round-4 driver-cap curation): the table registry
        # with its isSnapshot flag — distinct tables come from the same
        # init_table ops the flag lives on, so one query value-checks both.
        return LQ.is_snapshot(ops_log_df(spark, sf))

    # --- W: write/read surface --------------------------------------------

    def q_partition_filter(spark, sf):
        ev = load_table(spark, sf, "events")
        return (
            ev.where(F.col("ts").cast("date").cast("string") == "2024-01-05")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.countDistinct("user_id").alias("users"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )

    def q_versioned_write_roundtrip(spark, sf):
        # W2 + W5 merged (round-4 driver-cap curation): the fixture performs
        # the versioned writes (v1 all partitions + one overwrite), then the
        # current view is read back and value-checked against the plain
        # events oracle — upgrading the old rows-only roundtrip row to a
        # full hash-checked one (it was previously duplicated as
        # q_current_view with the identical body).
        #
        # The row ALSO gates the round-4 lifecycle extensions (schema
        # guard, branch WAP merge, partition restore) via an internal
        # assert on a tiny side table — same correctness-gate pattern as
        # q_time_travel_read — so a regression in any of them turns this
        # driver row red while the returned values stay byte-identical.
        #
        # The gate and the events fixture are INDEPENDENT (own tmp dirs,
        # own trackers, no shared table) and each is a chain of small
        # serial driver actions — overlap them (guide §2.6) so the row
        # costs max(gate, fixture) + read instead of their sum.  Both
        # results are consumed (and both error paths surface) before the
        # read; the returned values are byte-identical either way.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            gate_f = pool.submit(_wap_restore_gate, spark, sf)
            fixture_f = pool.submit(_write_versioned_events, spark, sf)
            table, tracker, _ = fixture_f.result()
            gate_f.result()
        return read_current(spark, table, tracker).select(*_EVENTS_VIEW_COLS)

    def q_time_travel_read(spark, sf):
        # time travel via BOTH resolutions sharing one oracle: the commit id
        # path (read_at_commit ≙ version_at) and the as-of-timestamp path
        # (commit_at_timestamp must resolve the first commit's own
        # timestamp back to that commit; the read then goes through the
        # identical fold+read machinery)
        table, tracker, first_commit = _write_versioned_events(spark, sf)
        ts = next(
            u.metadata.timestamp
            for u in tracker.table_state(table.name).updates
            if u.metadata.commit_id == first_commit
        )
        resolved = tracker.commit_at_timestamp(table.name, ts)
        if resolved != first_commit:  # pragma: no cover - correctness gate
            raise AssertionError(
                f"timestamp resolution {resolved} != commit-id path {first_commit}"
            )
        return read_at_timestamp(spark, table, tracker, ts).select(
            *_EVENTS_VIEW_COLS
        )

    def q_compact_roundtrip(spark, sf):
        # small-file compaction (spark/compact.py): live partitions
        # rewritten as ONE file each via a fresh committed version; values
        # must be byte-identical to the plain events oracle.  The read goes
        # through TAG resolution (read_at_tag ≙ tag_commit + version_at):
        # the post-compaction head is pinned and read back by name, so the
        # data-version-pinning path shares this oracle.
        table, tracker = _compact_fixture(spark, sf)
        try:
            tracker.set_tag(table.name, "post-compact")
        except ValueError:
            pass  # memoized fixture: tag already pinned at this head
        return read_at_tag(spark, table, tracker, "post-compact").select(
            *_EVENTS_VIEW_COLS
        )

    def q_read_changes(spark, sf):
        # incremental CDC read (spark/reader.py): partitions whose live
        # version changed since the FIRST commit — exactly the overwritten
        # 2024-01-05 partition of the lifecycle fixture (pure read; the
        # shared fixture is never mutated)
        table, tracker, first_commit = _write_versioned_events(spark, sf)
        return read_changes(spark, table, tracker, first_commit).select(
            *_EVENTS_VIEW_COLS
        )

    def q_vacuum_dry_run(spark, sf):
        # rows-only (side-effecting lifecycle): the overwritten partition
        # holds two versions; vacuum dry-run reports exactly the superseded
        # one and never the live one
        from chronicles_spark.spark import vacuum

        table, tracker, _ = _write_versioned_events(spark, sf)
        doomed = vacuum(table, tracker, keep_last=1, dry_run=True)
        return spark.createDataFrame(
            [(p,) for p in doomed], "doomed_path string"
        )

    def q_log_json_read(spark, sf):
        # V15: the commit log is itself distributed-readable —
        # one JSON file per commit, Delta-log style (JsonCodecs.scala:18-135,
        # FileBackedVersionTracker.scala:157-175).  Round 13: the read goes
        # through spark/log_reader.py::commit_log_df, which merges LIVE
        # commit files with ARCHIVED chunk artifacts (explicit schemas,
        # executor-side entry explode) — "the archive is the log
        # relocated" now holds for the distributed read path too.  The
        # fixture archives half its log into several size-capped chunks,
        # and an in-query gate asserts the distributed rows equal the
        # driver-side tracker fold (ids in seq order, archived split).
        from chronicles_spark.spark.log_reader import commit_log_df

        table, tracker = _log_read_fixture(sf)
        df = commit_log_df(spark, tracker, table)

        rows = df.select("seq", "commit_id", "archived").orderBy("seq").collect()
        st = tracker.table_state(table)
        want = list(zip(
            tracker.update_seqs(table),
            (u.metadata.commit_id for u in st.updates),
        ))
        if [(r["seq"], r["commit_id"]) for r in rows] != want:
            raise AssertionError(
                "distributed commit-log read diverged from the tracker fold"
            )
        d = tracker._table_dir(table)
        floor = tracker._read_floor_seq(d)
        if not any(r["archived"] for r in rows) or any(
            r["archived"] != (r["seq"] <= floor) for r in rows
        ):
            raise AssertionError(
                "archived/live split does not match the archive floor"
            )
        return (
            df.select(
                "commit_id", "user_id", "message", "archived",
                F.posexplode("operations").alias("op_index", "op"),
            )
            .select(
                "commit_id", "user_id", "message", "archived",
                F.col("op_index").cast("long").alias("op_index"),
                F.col("op.type").alias("op_type"),
                F.col("op.partition").alias("partition"),
            )
            .orderBy("commit_id", "op_index")
        )

    # --- string algebra as column functions --------------------------------

    def q_version_parse(spark, sf):
        # V11 + V12 merged (round-9 driver-cap curation, funding
        # q_dedup_emb_incremental): one synthetic (label, part_str) row
        # set value-checks version-label parsing (V11 — this row's
        # original job) AND multi-column partition parsing (V12 —
        # formerly q_partition_parse), both pure string algebra over the
        # same events-derived fixture.
        register_views(spark, sf, ("events",))
        df = spark.sql(LBL_PART_CTE + "SELECT label, part_str FROM built")
        t, n, u = version_label_parts(F.col("label"))
        pat = "^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$"
        return df.select(
            "label", t.alias("ts_part"), n.alias("nanos_part"),
            u.alias("uuid_part"),
            "part_str",
            F.regexp_extract("part_str", pat, 1).alias("col1"),
            F.regexp_extract("part_str", pat, 2).alias("val1"),
            F.regexp_extract("part_str", pat, 3).alias("col2"),
            F.regexp_extract("part_str", pat, 4).alias("val2"),
        )

    def q_version_paths(spark, sf):
        # V13 + M1 merged (round-4 driver-cap curation): one pass over the
        # synthetic versioned paths value-checks the whole path algebra —
        # partition extraction (M1's parse-versions-from-locations, formerly
        # q_parse_versions_from_paths), version-label extraction, and
        # base-path stripping (V13's pathFor/parseVersion/versionedToBasePath).
        register_views(spark, sf, ("events",))
        df = spark.sql(
            _mk_lbl_paths_sql("s3://warehouse/events/date=") + "SELECT path FROM paths"
        )
        return df.select(
            "path",
            partition_of_path(F.col("path"), "date").alias("part"),
            version_of_path(F.col("path")).alias("version_label"),
            base_path_of(F.col("path")).alias("base_path"),
        )

    def q_partition_expr_render(spark, sf):
        # M10 + W1 merged (round-4 driver-cap curation): the inner distinct
        # projection IS W1's partitionValues (formerly q_partition_values);
        # the rendered hive expr value-checks M10 on top of it.
        ev = load_table(spark, sf, "events")
        d = ev.select(
            F.col("ts").cast("date").cast("string").alias("event_date"),
            "event_type",
        ).distinct()
        return d.select(
            "event_date",
            "event_type",
            hive_partition_expr(
                ("event_date", F.col("event_date")), ("event_type", F.col("event_type"))
            ).alias("hive_expr"),
        )

    # --- user-data query surface (Spark's own, over normalized sources) ----

    def q_tpch_q3(spark, sf):
        cust = load_table(spark, sf, "customer")
        orders = load_table(spark, sf, "orders")
        li = load_table(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(
                F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
                orders.o_custkey == F.col("c_custkey"),
            )
            .where(
                (F.col("o_orderdate") < "1998-03-15")
                & (F.col("l_shipdate") > "1998-03-15")
            )
            .groupBy(
                "o_orderkey",
                F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
                "o_orderpriority",
            )
            .agg(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("revenue")
            )
        )


    # --- training-data pipeline: text analysis -----------------------------

    def q_token_count(spark, sf):
        # round-7 curation (the documented cap-merge, executed to free the
        # slot for q_ann_index_search): q_quality_score merged in — same
        # fixture, same single-scan map-side shape; every column of BOTH
        # former rows stays hash-checked (with_token_counts's n_tokens is
        # dropped and recomputed by with_quality_score — identical expr,
        # avoids the duplicate output name).
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        merged = TX.with_quality_score(
            TX.with_token_counts(docs).drop("n_tokens")
        )
        return _longify(merged.drop("text"))

    def q_repetition_signals(spark, sf):
        # Gopher-style intra-doc repetition quality signals (text.py).
        #
        # Round-5 curation (merge-don't-add, per CLAUDE.md): the row now
        # ALSO value-checks the two new members of the same quality
        # family — gopher_quality_filter (per-rule booleans + keep) and
        # remove_repeated_spans (md5 of the cleaned text + span counts) —
        # chained map-side on the same scan, every column hash-compared
        # against the DuckDB oracle.
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        out = TX.remove_repeated_spans(TX.gopher_quality_filter(docs))
        frac_cols = [f"{p}{n}_frac" for n in (1, 2, 3) for p in ("top", "dup")]
        return _longify(
            out.select(
                "doc_id",
                *frac_cols,
                *TX._GOPHER_RULE_COLS,
                "gopher_keep",
                F.md5("text_clean").alias("clean_md5"),
                "n_spans",
                "n_spans_kept",
            )
        )

    def q_training_shards(spark, sf):
        # deterministic shard+position export shuffle (text.py)
        docs = load_table(spark, sf, "documents").select("doc_id", "lang")
        return TX.training_shards(docs, n_shards=8, seed="epoch0")

    def q_corpus_mixture(spark, sf):
        # per-(source, lang) doc/token accounting for mixture weights
        docs = load_table(spark, sf, "documents")
        return _longify(TX.corpus_mixture(docs))

    def q_lang_id(spark, sf):
        # round-8 merge (the documented next-candidate consolidation):
        # lang-ID scores AND both document fingerprints off ONE
        # documents scan — the merged oracle still value-checks every
        # fingerprint column, and the freed slot carries
        # q_dedup_incremental.  Both operators are map-side projections,
        # so the merged row stays one zero-exchange codegen span.
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(
            TX.with_fingerprints(TX.with_lang_id(docs)).drop("text")
        )

    # --- training-data pipeline: dedup -------------------------------------

    def q_redact_pii(spark, sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return TX.with_redactions(docs).select(
            "doc_id", "text_redacted", "was_redacted"
        )

    def q_top_ngrams(spark, sf):
        # round-14 merge (the CLAUDE-named next candidate, executed to
        # free the slot for q_semantic_dedup): corpus top-ngrams AND
        # benchmark decontamination share the documents n-gram fixture —
        # union tagged by `kind` (the q_ann_cosine_topk precedent), with
        # each leg's columns aliased to one (key, metric_a, metric_b)
        # shape so EVERY column of both former rows stays hash-checked:
        # top_ngrams → (ngram, rnk, doc_freq); contamination →
        # (doc_id, n_hits, NULL).
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        top = _longify(TX.top_ngrams(docs, n=2, k=50)).select(
            F.lit("top_ngrams").alias("kind"),
            F.col("ngram").alias("key"),
            F.col("rnk").alias("metric_a"),
            F.col("doc_freq").alias("metric_b"),
        )
        benchmark = docs.where("doc_id < 5")
        cont = _longify(
            TX.flag_contaminated(
                docs.where("doc_id >= 5"), benchmark, n=3, min_hits=2
            )
        ).select(
            F.lit("contamination").alias("kind"),
            F.col("doc_id").cast("string").alias("key"),
            F.col("n_hits").alias("metric_a"),
            F.lit(None).cast("long").alias("metric_b"),
        )
        return top.unionByName(cont)

    def q_stratified_sample(spark, sf):
        # deterministic language-mix reweighting: keep all de/zh, half en,
        # a quarter es, drop fr — md5-hash uniforms, stable across engines
        docs = load_table(spark, sf, "documents").select("doc_id", "lang")
        return TX.stratified_sample(
            docs, {"en": 0.5, "de": 1.0, "es": 0.25, "zh": 1.0}, "lang"
        )

    def q_pack_sequences(spark, sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(TX.pack_sequences(docs, token_budget=2048, n_shards=64))

    def q_curate_corpus(spark, sf):
        # the end-to-end composition: quality filter + near-dup cluster
        # survivor selection, every stage reusing an audited operator
        from chronicles_spark.operators.pipeline import curate_corpus

        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(
            curate_corpus(
                docs,
                quality_threshold=0.3,
                bands=_MINHASH_BANDS,
                rows=_MINHASH_ROWS,
                jaccard_threshold=_JACCARD_THRESHOLD,
            )
        )

    def q_dedup_exact(spark, sf):
        docs = load_table(spark, sf, "documents")
        return DD.exact_duplicate_groups(
            docs, F.md5(F.substring("text", 1, 100))
        )

    def q_dedup_minhash_lsh(spark, sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(
            DD.minhash_dedup(
                docs,
                bands=_MINHASH_BANDS,
                rows=_MINHASH_ROWS,
                threshold=_JACCARD_THRESHOLD,
            )
        )

    def q_dedup_incremental(spark, sf):
        # round-8: O(batch) corpus-delta dedup against the MATERIALIZED
        # MinHash index (operators/dedup_index.py — the ann_id_map
        # pattern applied to fuzzy dedup).  One fifth of the documents
        # table arrives as "today's batch" against an index over the
        # other four fifths: candidate generation reads ONLY the batch's
        # band-shard partitions, exact-Jaccard verify fetches shingles
        # from ONLY the candidates' doc shards, and the publish is a
        # shard-scoped RMW pair commit.  In-row gate: the band table
        # must re-derive exactly from the stored shingles after the
        # extend (verify_dedup_index empty).  The oracle is the full
        # minhash CTE chain restricted to pairs with a batch endpoint —
        # incremental == full re-run is the module's contract.
        from chronicles_spark.operators import dedup_index as DX

        table, tracker = _dedup_index_fixture(spark, sf)
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        pairs, _, _ = DX.extend_dedup_index(
            docs.where("doc_id % 5 = 0"), table, tracker,
            threshold=_JACCARD_THRESHOLD,
        )
        if DX.verify_dedup_index(spark, table, tracker).count():
            raise AssertionError(
                "dedup index inconsistent with its shingle store after extend"
            )
        return _longify(pairs)

    def q_dedup_ngram_jaccard(spark, sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(
            DD.ngram_jaccard_pairs(
                docs,
                threshold=_NGRAM_THRESHOLD,
                max_shingle_freq=_NGRAM_MAX_SHINGLE_FREQ,
            )
        )

    def q_dedup_clusters(spark, sf):
        # verified near-dup pairs → connected components → survivor table
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        pairs = DD.minhash_dedup(
            docs,
            bands=_MINHASH_BANDS,
            rows=_MINHASH_ROWS,
            threshold=_JACCARD_THRESHOLD,
        )
        return DD.dedup_clusters(pairs)

    def q_dedup_simhash_pairs(spark, sf):
        # banded candidate pairs + exact hamming distance; the band keys and
        # the hamming check are both derived from simhash_expr, so this one
        # query value-checks the fingerprint (formerly q_dedup_simhash) and
        # the banding on top of it (round-4 driver-cap curation), including
        # the band-piece frequency skew guard mirrored in the oracle.
        # Round-10: the row ALSO gates the incremental SimHash INDEX
        # family (extend == one-shot differential + store audit, the
        # _pq_gate pattern) — a family regression turns this row red
        # while the returned values stay byte-identical.
        _simhash_index_gate(spark, sf)
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return _longify(
            DD.simhash_near_dup_candidates(
                docs, max_band_freq=_SIMHASH_MAX_BAND_FREQ
            ).where(F.col("hamming") <= 6)
        )

    def q_dedup_embedding(spark, sf):
        # scale path: banded sign-LSH candidates → exact-cosine verify.
        # The O(N²) all-pairs join lives only in tests as the recall oracle.
        emb = load_table(spark, sf, "embeddings")
        return DD.embedding_lsh_dedup(
            emb,
            dim=_EMB_DIM,
            threshold=_COSINE_DEDUP_THRESHOLD,
            n_planes=_EMB_LSH_PLANES,
            bands=_EMB_LSH_BANDS,
        )

    def q_dedup_emb_incremental(spark, sf):
        # round-9: O(batch) corpus-delta EMBEDDING dedup against the
        # materialized sign-LSH index (operators/emb_dedup_index.py —
        # the dedup_index family core, embedding instance).  One fifth
        # of the embeddings table arrives as "today's batch" against an
        # index over the other four fifths: candidate generation reads
        # ONLY the batch's band shards (row-group pruned to its band
        # keys), exact-cosine verify fetches vectors from ONLY the
        # candidates' doc shards, and the publish is a shard-scoped RMW
        # pair commit.  In-row gate: the band table must re-derive
        # exactly from the stored vectors after the extend.  The oracle
        # is the full sign-LSH CTE chain restricted to pairs with a
        # batch endpoint — incremental == full re-run is the contract.
        from chronicles_spark.operators import emb_dedup_index as EX

        table, tracker = _emb_dedup_index_fixture(spark, sf)
        emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
        pairs, _, _ = EX.extend_embedding_dedup_index(
            emb.where("vec_id % 5 = 0"), table, tracker,
            threshold=_COSINE_DEDUP_THRESHOLD,
        )
        if EX.verify_embedding_dedup_index(spark, table, tracker).count():
            raise AssertionError(
                "embedding dedup index inconsistent with its vector store "
                "after extend"
            )
        return pairs

    def q_semantic_dedup(spark, sf):
        # round-14 (VERDICT r13 #5): the SemDeDup family's own
        # HASH-CHECKED row.  The one-shot semantic_dedup runs under
        # INJECTED deterministic centroids — the embeddings of the k
        # lowest vec_ids, pure selection, no learning (the pq_fit
        # iters=0 pattern) — which makes the whole recipe
        # SQL-expressible: assignment is an argmin of squared-L2 over
        # literal centroids (ties to the lowest centroid id, exactly
        # _assign_nearest's tie-break), pairs are the in-cluster
        # self-join, cosine is the house round-6 expression.  The
        # LEARNED-centroid members (kmeans_fit + the incremental index)
        # stay under the q_ann_ivf_kmeans gates, which ALSO pin that an
        # extend equals this one-shot under pinned centroids.
        emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.where(F.col("vec_id") < _SEMD_K)
            .orderBy("vec_id")
            .collect()  # k centroid rows — metadata-scale, never the corpus
        ]
        return DD.semantic_dedup(
            emb,
            dim=_EMB_DIM,
            n_clusters=_SEMD_K,
            threshold=_COSINE_DEDUP_THRESHOLD,
            centroids=cents,
            max_cluster_size=10**9,  # skew sub-buckets off: exact contract
        )

    # --- training-data pipeline: multimodal (binary) columns ---------------

    def q_mm_decode_meta(spark, sf):
        # merged multimodal row (round-4 driver-cap curation): JVM-side
        # typed metadata (formerly q_mm_binary_meta) rides through the
        # Arrow-batched mapInPandas decode pass via the passthrough
        # channel — one query, zero shuffle, no post-decode join.
        # Round-10 merge (the documented next-candidate consolidation):
        # q_mm_frame_sample folds in as the per-frame grain — every
        # decode/meta column is value-checked on every frame row, and
        # the frame sampler's (frame_index, frame_offset) striding is
        # value-checked alongside; the freed slot carries
        # q_dedup_clusters_incremental.  The join is asset_id-keyed on
        # both sides (co-partitionable at scale; AQE broadcasts here).
        docs = load_table(spark, sf, "documents")
        assets = MM.with_binary_meta(MM.as_binary_assets(docs))
        decoded = MM.decode_image_meta(
            assets,
            passthrough=(
                "media_type", "byte_len", "content_sha256", "magic_bytes",
            ),
        )
        frames = MM.sample_frames(MM.as_binary_assets(docs))
        return _longify(frames.join(decoded, "asset_id"))

    def q_mm_dedup_binary(spark, sf):
        # prefix fingerprint (header-chunk identity) so the testdata's
        # shared-prefix duplicates actually group
        docs = load_table(spark, sf, "documents")
        return MM.dedup_binary_exact(MM.as_binary_assets(docs), prefix_bytes=100)

    def q_dedup_clusters_incremental(spark, sf):
        # round-10: incremental duplicate-CLUSTER maintenance
        # (operators/cluster_index.py — the pairs journal folded into a
        # versioned (doc_id, cluster_id) assignment table).  The fixture
        # folds HALF the corpus' verified minhash pairs as batch b0;
        # this row folds the other half (cross-batch merges exercised
        # organically by clusters straddling the split), audits the
        # paired tables (assign ⟷ members + min-member invariant), and
        # returns the assignment read back — which must equal the
        # one-shot dedup_clusters over ALL pairs exactly (the module's
        # confluence contract).  The oracle is the same recursive-CTE
        # connected-components chain as q_dedup_clusters.
        from chronicles_spark.operators import cluster_index as CX
        from chronicles_spark.spark.reader import read_version

        table, tracker, pairs_all = _cluster_idx_fixture(spark, sf)
        CX.extend_dedup_clusters(
            pairs_all.where("(id_a + id_b) % 2 = 1"), table, tracker,
            batch_label="fold-b1",
        )
        if CX.verify_dedup_clusters(spark, table, tracker).count():
            raise AssertionError(
                "cluster assignment inconsistent with its members "
                "companion after fold"
            )
        # round-12: journal compaction rides this row (the family's only
        # driver surface) — a compact_dedup_pairs regression reddens it
        _compact_pairs_gate(spark, sf, pairs_all)
        state = tracker.current_version(table.name)
        return (
            read_version(spark, table, state, infer_partition_types=False)
            .select(
                "doc_id",
                "cluster_id",
                (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
            )
        )

    def q_running_totals(spark, sf):
        # batch twin of the streaming applyInPandasWithState operator:
        # cumulative per-user totals over event time.
        #
        # Round-5 driver-cap curation: q_topk_per_group (green in r3, then
        # silently dropped in r4 — VERDICT r4 "What's wrong" #2) is folded
        # in here as the `value_rank_in_user` column: the per-group
        # ROW_NUMBER ranking that top-k-per-group is made of, value-checked
        # over every row (the `WHERE rnk <= k` filter the old row added on
        # top is trivial once the rank itself is hash-verified).
        from pyspark.sql import Window as W

        events = load_table(spark, sf, "events")
        w = (
            W.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        w_rank = W.partitionBy("user_id").orderBy(
            F.col("value").desc(), F.col("event_id").asc()
        )
        return _longify(
            events.select(
                "user_id",
                "event_id",
                "ts",
                F.count(F.lit(1)).over(w).alias("n_so_far"),
                F.round(F.sum("value").over(w), 6).alias("total_so_far"),
                F.row_number().over(w_rank).alias("value_rank_in_user"),
            )
        )

    def q_asof_join(spark, sf):
        # backward as-of join (union-tag plan, one shuffle) vs DuckDB's
        # native ASOF JOIN: every non-purchase event picks up the user's
        # latest prior purchase value
        from chronicles_spark.operators.joins import as_of_join

        events = load_table(spark, sf, "events")
        purchases = (
            events.where("event_type = 'purchase'")
            .groupBy("user_id", "ts")
            .agg(F.max_by("value", "event_id").alias("last_purchase_value"))
        )
        left = events.where("event_type <> 'purchase'").select(
            "event_id", "user_id", "ts"
        )
        return as_of_join(left, purchases, "user_id").select(
            "event_id", "user_id", "ts", "last_purchase_value"
        )

    def q_range_join(spark, sf):
        # point-in-interval via bucketize + equi-join + exact filter (never
        # the O(points·intervals) cartesian); oracle is DuckDB's native
        # inequality join
        from chronicles_spark.operators.joins import range_join

        events = load_table(spark, sf, "events")
        points = events.select("event_id", "event_type", "ts")
        intervals = (
            events.select(
                "event_type", F.col("ts").cast("date").alias("d")
            )
            .distinct()
            .select(
                "event_type",
                F.col("d").cast("timestamp_ntz").alias("start_ts"),
                F.date_add("d", 2).cast("timestamp_ntz").alias("end_ts"),
            )
        )
        # intervals = distinct (event_type, date) — provably dimension-
        # sized (types × days), so the exploded interval side broadcasts
        # and the corpus-scale point side is never shuffled (guide §3.1)
        return range_join(
            points, intervals, "event_type", "ts", "start_ts", "end_ts",
            broadcast_intervals=True,
        ).select("event_id", "event_type", "ts", "start_ts", "end_ts")

    # --- streaming aggregates (batch mode of the dual-mode plans) ----------

    def q_stream_windowed_agg(spark, sf):
        # same plan a readStream runs with a watermark; batch mode is the
        # deterministic oracle-checkable path
        from chronicles_spark.streaming import windowed_counts

        events = load_table(spark, sf, "events")
        return windowed_counts(events)

    def q_sessionize(spark, sf):
        from chronicles_spark.streaming import sessionize

        events = load_table(spark, sf, "events")
        return sessionize(events)

    # --- training-data pipeline: similarity search -------------------------

    def q_ann_cosine_topk(spark, sf):
        # merged row (round-13 driver-cap curation, round-4 precedent):
        # brute-force exact cosine top-k AND the IVF-probed variant
        # (formerly q_ann_ivf — same embeddings fixture, same ranked
        # contract) union into one hash-checked row tagged by `method`,
        # so BOTH operators stay value-checked while freeing a driver
        # slot for future families.
        emb = load_table(spark, sf, "embeddings")
        qids = emb.select("vec_id").where(F.col("vec_id") < 5)
        brute = (
            SIM.brute_topk(emb, qids, k=10)
            .withColumnRenamed("rank", "rnk")
            .withColumn("method", F.lit("brute"))
        )
        ivf = (
            SIM.ivf_topk(emb, qids, k=10, n_probe=2)
            .withColumnRenamed("rank", "rnk")
            .withColumn("method", F.lit("ivf"))
        )
        return _longify(brute.unionByName(ivf))

    def q_emb_transform(spark, sf):
        # merged embedding-transform row (round-4 driver-cap curation):
        # L2-normalize (formerly q_emb_normalize) and symmetric int8
        # quantization (formerly q_emb_quantize) are both map-side
        # projections over the same column, so one query value-checks both.
        #
        # Round 5: the array columns are serialized to canonical CSV
        # strings ("%.6f" per element) — the driver's pandas canonicalizer
        # cannot sort rows containing top-level array values (r4's one red
        # row), and scripts/check_oracle.py now lints against them.  The
        # underlying operators still return real array<double>/array<int>
        # columns; only this driver-facing row flattens.
        #
        # The row ALSO value-checks pq_encode against the SQL oracle using
        # a DETERMINISTIC iters=0 codebook (= subvector slices of the
        # k_sub lowest-id vectors — pure selection, no learning), so the
        # PQ argmin/slicing machinery is hash-compared end-to-end; the
        # LEARNED-codebook members stay under the q_ann_ivf_kmeans gate
        # (iterative fits have no SQL oracle).
        emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
        books0 = SIM.pq_fit(emb, m=4, k_sub=4, iters=0)
        out = SIM.pq_encode(
            SIM.quantize_int8(SIM.normalize_l2(emb)), books0, keep_cols=True
        )
        return out.select(
            "vec_id",
            F.concat_ws(
                ",",
                F.transform("embedding_unit", lambda x: F.format_string("%.6f", x)),
            ).alias("embedding_unit_csv"),
            F.concat_ws(",", F.col("q_codes").cast("array<string>")).alias(
                "q_codes_csv"
            ),
            "q_scale",
            F.concat_ws(",", F.col("pq_codes").cast("array<string>")).alias(
                "pq_codes_csv"
            ),
        )

    def q_ann_ivf_kmeans(spark, sf):
        # rows-only (iterative algorithm — no SQL oracle; pytest verifies
        # against an independent numpy reference): IVF over LEARNED
        # k-means buckets, the production centroid path.
        #
        # Round-5 curation: this row also GATES the product-quantization
        # family (pq_fit/pq_encode/pq_decode/pq_adc_topk — same
        # learned-codebook family, same no-SQL-oracle reason; numpy
        # differentials live in tests/test_pq.py).  A PQ regression turns
        # this row red while the returned IVF values stay unchanged —
        # the q_versioned_write_roundtrip gate pattern.
        #
        # Round-10: ALSO gates the incremental SEMANTIC dedup index
        # (operators/semantic_dedup_index.py — the same learned-centroid
        # family; extend == one-shot under pinned centroids + store
        # audit).
        _pq_gate(spark, sf)
        _semantic_dedup_index_gate(spark, sf)
        emb = load_table(spark, sf, "embeddings")
        queries = emb.selectExpr("vec_id").where("vec_id < 5")
        return SIM.ivf_topk_kmeans(
            emb, queries, k=10, n_probe=2, n_clusters=8, iters=3
        )

    def q_ann_index_search(spark, sf):
        # the materialized ANN index family's hash-checked row (round 7 —
        # the slot freed by the q_token_count/q_quality_score merge):
        # build a REAL versioned index (scan-pruned read through the
        # versioned reader, companion id map committed in the same
        # group) under deterministic iters=0 artifacts, then IVF+PQ
        # asymmetric-distance search; the DuckDB oracle reproduces the
        # full bucket-assign/encode/probe/ADC ranking in SQL.
        from chronicles_spark.operators import ann_index as AX

        table, tracker = _ann_index_fixture(spark, sf)
        emb = load_table(spark, sf, "embeddings")
        qs = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        return _longify(
            AX.ivfpq_topk_indexed(
                spark, table, tracker, qs, k=10, n_probe=2
            ).withColumnRenamed("rank", "rnk")
        )

    for name, fn in list(locals().items()):
        if name.startswith("q_"):
            q[name] = fn
    return q


# ---------------------------------------------------------------------------
# oracles


def oracle_sql() -> dict[str, str]:
    fold_re = "^" + VERSION_LABEL_RE + "$"
    return {
        "q_current_version_fold": LOG_CTE + FOLD_AT_HEAD,
        "q_compute_changes": LOG_CTE
        + ", fold_head AS ("
        + FOLD_AT_HEAD
        + "), fold_latest AS ("
        + FOLD_LATEST
        + """)
SELECT COALESCE(c.part, t.part) AS part,
       CASE WHEN c.part IS NULL THEN 'add_partition'
            WHEN t.part IS NULL THEN 'remove_partition'
            ELSE 'update_partition_version' END AS change_type,
       t.version AS new_version
FROM fold_head c FULL OUTER JOIN fold_latest t ON c.part = t.part
WHERE c.part IS NULL OR t.part IS NULL OR c.version <> t.version
""",
        "q_snapshot_version_fold": LOG_CTE
        + """
SELECT o.version AS current_table_version
FROM ops_log o JOIN head_ref h ON o.table_name = h.table_name
WHERE o.table_name = 'demo.users'
  AND o.operation_type = 'add_table_version'
  AND o.sequence_id <= h.head_seq
ORDER BY o.sequence_id DESC, o.index_in_commit DESC
LIMIT 1
""",
        "q_updates_log": LOG_CTE
        + """
SELECT sequence_id, commit_id, table_name, user_id, message
FROM ops_log WHERE index_in_commit = 0
""",
        "q_table_state_group": LOG_CTE
        + """
SELECT commit_id, COUNT(*) AS n_ops,
       string_agg(operation_type, ',' ORDER BY index_in_commit) AS ops_csv
FROM ops_log GROUP BY commit_id
""",
        # V1 + V7 merged: the table registry with its isSnapshot flag
        "q_tables_list": LOG_CTE
        + """
SELECT table_name, is_snapshot_table
FROM ops_log WHERE operation_type = 'init_table'
""",
        "q_partition_filter": """
SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events
WHERE CAST(CAST(ts AS DATE) AS STRING) = '2024-01-05'
GROUP BY event_type
""",
        # W2 + W5: versioned writes (fixture) read back through the current
        # view must be value-identical to the plain events table
        "q_versioned_write_roundtrip": _EVENTS_ORACLE,
        "q_time_travel_read": _EVENTS_ORACLE,
        # compaction rewrites the file layout, never the values
        "q_compact_roundtrip": _EVENTS_ORACLE,
        # V15: the distributed commit-log read vs DuckDB read_json over
        # the SAME live files + archive chunk artifacts (round 14 — the
        # row's first value oracle; the floor-split gate stays in-query)
        "q_log_json_read": _log_json_oracle_sql(),
        # the only partition whose version changed after the first commit
        "q_read_changes": """
SELECT event_id, user_id, event_type, value,
       CAST(CAST(ts AS DATE) AS STRING) AS event_date
FROM events
WHERE CAST(CAST(ts AS DATE) AS STRING) = '2024-01-05'
""",
        # V11 + V12 merged: label parsing + multi-column partition parsing
        "q_version_parse": LBL_PART_CTE
        + f"""
SELECT label,
       regexp_extract(label, '{fold_re}', 1) AS ts_part,
       regexp_extract(label, '{fold_re}', 2) AS nanos_part,
       regexp_extract(label, '{fold_re}', 3) AS uuid_part,
       part_str,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 1) AS col1,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 2) AS val1,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 3) AS col2,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 4) AS val2
FROM built
""",
        # V13 + M1 merged: partition parse, version-label parse, base-path strip
        "q_version_paths": _mk_lbl_paths_sql("s3://warehouse/events/date=")
        + """
SELECT path,
       regexp_extract(path, '(date=[^/]+)', 1) AS part,
       regexp_extract(path, '_version=([^/]+)$', 1) AS version_label,
       regexp_replace(path, '/_version=[^/]+$', '') AS base_path
FROM paths
""",
        "q_partition_expr_render": """
SELECT event_date, event_type,
       '(event_date=''' || event_date || ''',event_type=''' || event_type || ''')' AS hive_expr
FROM (
  SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type
  FROM events
) x
""",
        "q_tpch_q3": """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, CAST(CAST(o_orderdate AS DATE) AS STRING), o_orderpriority
""",
    
        # --- training-data pipeline oracles --------------------------------
        # round-7 merged row: token counting + quality scoring (one scan)
        "q_token_count": """
SELECT doc_id,
       length(text) AS n_chars_computed,
       len(regexp_split_to_array(trim(text), ' +')) AS n_ws_tokens,
       len(list_distinct(t)) AS n_distinct_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe_pieces,
       len(t) AS n_tokens,
       round((least(len(t), 100) / 100.0
              + len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) / len(t)
              + len(list_distinct(t)) / len(t)) / 3, 4) AS quality_score
FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
      FROM documents) x
""",
        "q_repetition_signals": """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
  FROM documents
),
g AS (
  SELECT doc_id, 1 AS n, t[i] AS gram
  FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
  UNION ALL
  SELECT doc_id, 2, t[i] || ' ' || t[i+1]
  FROM tok, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)
  UNION ALL
  SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  FROM tok, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
),
c AS (SELECT doc_id, n, gram, count(*) AS c FROM g GROUP BY doc_id, n, gram),
s AS (
  SELECT doc_id, n,
         round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_frac,
         round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c), 6) AS dup_frac
  FROM c GROUP BY doc_id, n
),
fr AS (
  SELECT d.doc_id,
         coalesce(max(CASE WHEN n = 1 THEN top_frac END), 0.0) AS top1_frac,
         coalesce(max(CASE WHEN n = 1 THEN dup_frac END), 0.0) AS dup1_frac,
         coalesce(max(CASE WHEN n = 2 THEN top_frac END), 0.0) AS top2_frac,
         coalesce(max(CASE WHEN n = 2 THEN dup_frac END), 0.0) AS dup2_frac,
         coalesce(max(CASE WHEN n = 3 THEN top_frac END), 0.0) AS top3_frac,
         coalesce(max(CASE WHEN n = 3 THEN dup_frac END), 0.0) AS dup3_frac
  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
  GROUP BY d.doc_id
),
rules AS (
  SELECT tok.doc_id,
         len(t) AS n_tok,
         CASE WHEN len(t) > 0
              THEN CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t)
              ELSE 0.0 END AS mean_wlen,
         CASE WHEN len(t) > 0
              THEN CAST(len(regexp_extract_all(d.text, '[#…]|[.][.][.]', 0)) AS DOUBLE) / len(t)
              ELSE 0.0 END AS sym_ratio,
         len(list_filter(list_distinct(t),
             x -> list_contains(['the','a','of','and','to','in','is','on'], x)))
           AS distinct_stops
  FROM tok JOIN documents d ON tok.doc_id = d.doc_id
),
spansrc AS (
  SELECT doc_id,
         list_transform(string_split(text, chr(10)),
                        s -> regexp_replace(s, '\r+$', '')) AS spans
  FROM documents
),
cleaned AS (
  SELECT doc_id, spans,
         list_filter(spans, (s, i) -> len(s) < 1 OR list_position(spans, s) = i)
           AS kept
  FROM spansrc
),
linesrc AS (
  SELECT doc_id,
         list_filter(spans, s -> len(s) > 0) AS lines
  FROM spansrc
),
linerules AS (
  SELECT l.doc_id,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, s -> substr(ltrim(s), 1, 1) IN ('-', '*', '•'))) / len(lines)
         ELSE 0.0 END AS bullet_frac,
    CASE WHEN len(lines) > 0
         THEN len(list_filter(lines, s -> ends_with(rtrim(s), '...') OR ends_with(rtrim(s), '…'))) / len(lines)
         ELSE 0.0 END AS ellipsis_frac,
    CASE WHEN len(w.words) > 0 AND w.words[1] <> ''
         THEN len(list_filter(w.words, x -> regexp_matches(x, '[A-Za-z]'))) / len(w.words)
         ELSE 0.0 END AS alpha_frac
  FROM linesrc l JOIN (
    SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS words
    FROM documents
  ) w ON l.doc_id = w.doc_id
),
linestats AS (
  SELECT doc_id,
         coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / sum(c), 0.0)
           AS dup_line_frac
  FROM (
    SELECT doc_id, l, count(*) AS c
    FROM (SELECT doc_id, unnest(lines) AS l FROM linesrc) x
    GROUP BY doc_id, l
  ) g
  GROUP BY doc_id
)
SELECT fr.doc_id,
       fr.top1_frac, fr.dup1_frac, fr.top2_frac, fr.dup2_frac,
       fr.top3_frac, fr.dup3_frac,
       (r.n_tok >= 50) AS pass_min_tokens,
       (r.n_tok <= 100000) AS pass_max_tokens,
       (r.mean_wlen BETWEEN 3.0 AND 10.0) AS pass_word_len,
       (r.sym_ratio <= 0.1) AS pass_symbol_ratio,
       (r.distinct_stops >= 2) AS pass_stopwords,
       (fr.top2_frac <= 0.20) AS pass_top2,
       (fr.dup3_frac <= 0.30) AS pass_dup3,
       (lr.bullet_frac <= 0.90) AS pass_bullet_lines,
       (lr.ellipsis_frac <= 0.30) AS pass_ellipsis_lines,
       (lr.alpha_frac >= 0.80) AS pass_alpha_words,
       (coalesce(ls.dup_line_frac, 0.0) <= 0.30) AS pass_dup_lines,
       ((r.n_tok >= 50) AND (r.n_tok <= 100000)
        AND (r.mean_wlen BETWEEN 3.0 AND 10.0)
        AND (r.sym_ratio <= 0.1) AND (r.distinct_stops >= 2)
        AND (fr.top2_frac <= 0.20) AND (fr.dup3_frac <= 0.30)
        AND (lr.bullet_frac <= 0.90) AND (lr.ellipsis_frac <= 0.30)
        AND (lr.alpha_frac >= 0.80)
        AND (coalesce(ls.dup_line_frac, 0.0) <= 0.30)) AS gopher_keep,
       md5(array_to_string(c.kept, chr(10))) AS clean_md5,
       CAST(len(c.spans) AS BIGINT) AS n_spans,
       CAST(len(c.kept) AS BIGINT) AS n_spans_kept
FROM fr JOIN rules r ON fr.doc_id = r.doc_id
        JOIN cleaned c ON fr.doc_id = c.doc_id
        JOIN linerules lr ON fr.doc_id = lr.doc_id
        LEFT JOIN linestats ls ON fr.doc_id = ls.doc_id
""",
        "q_corpus_mixture": """
WITH g AS (
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+', 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM g), 6) AS token_frac
FROM g
""",
        "q_training_shards": """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('epoch0|' || doc_id::VARCHAR), 1, 8))::BIGINT AS hv
  FROM documents
)
SELECT doc_id, lang,
       CAST(hv % 8 AS INTEGER) AS shard,
       ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv ASC, doc_id ASC) AS shard_pos
FROM h
""",
        "q_lang_id": """
SELECT doc_id, score_en, score_de, score_es, score_fr, score_zh,
       CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
            WHEN score_en >= greatest(score_de, score_es, score_fr, score_zh) THEN 'en'
            WHEN score_de >= greatest(score_es, score_fr, score_zh) THEN 'de'
            WHEN score_es >= greatest(score_fr, score_zh) THEN 'es'
            WHEN score_fr >= score_zh THEN 'fr'
            ELSE 'zh' END AS lang_pred,
       fp_exact, fp_content
FROM (
  SELECT doc_id,
    len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS score_en,
    len(list_filter(t, x -> x IN ('der','die','das','und','ist','von','mit','nicht'))) AS score_de,
    len(list_filter(t, x -> x IN ('el','la','de','que','y','en','un','es'))) AS score_es,
    len(list_filter(t, x -> x IN ('le','la','de','et','un','est','dans','que'))) AS score_fr,
    len(list_filter(t, x -> x IN ('de','shi','le','zai','wo','you','he','bu'))) AS score_zh,
    md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp_exact,
    md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp_content
  FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
        FROM documents) x
) s
""",
        "q_dedup_exact": """
SELECT md5(substr(text, 1, 100)) AS fp, count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents
GROUP BY md5(substr(text, 1, 100))
HAVING count(*) > 1
""",
        "q_dedup_minhash_lsh": _MINHASH_CTES
        + f"""
SELECT id_a, id_b, n_inter * 1.0 / (n_a + n_b - n_inter) AS jaccard
FROM inter
WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_JACCARD_THRESHOLD}
""",
        # incremental == full re-run restricted to pairs touching the
        # batch (doc_id % 5 = 0) — the dedup index's whole contract
        "q_dedup_incremental": _MINHASH_CTES
        + f"""
SELECT id_a, id_b, n_inter * 1.0 / (n_a + n_b - n_inter) AS jaccard
FROM inter
WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_JACCARD_THRESHOLD}
  AND (id_a % 5 = 0 OR id_b % 5 = 0)
""",
        # fold-by-fold over the cluster index == one-shot connected
        # components over ALL pairs — the incremental module's contract,
        # so BOTH rows share this recursive-CTE oracle verbatim
        "q_dedup_clusters_incremental": _MINHASH_CTES.replace(
            "WITH docs", "WITH RECURSIVE docs", 1
        )
        + f""",
verified AS (
  SELECT id_a, id_b FROM inter
  WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS keep
FROM reach GROUP BY id
""",
        "q_dedup_clusters": _MINHASH_CTES.replace("WITH docs", "WITH RECURSIVE docs", 1)
        + f""",
verified AS (
  SELECT id_a, id_b FROM inter
  WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id, (id = min(r)) AS keep
FROM reach GROUP BY id
""",
        "q_redact_pii": """
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
         'https?://[^\\s]+', '<URL>', 'g'),
         '[+]?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') AS text_redacted,
       regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
         'https?://[^\\s]+', '<URL>', 'g'),
         '[+]?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g') <> text AS was_redacted
FROM documents
""",
        "q_top_ngrams": """
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
  FROM documents
),
grams2 AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS ngram
  FROM tok, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) AS u(i)
),
counts AS (SELECT ngram, count(*) AS doc_freq FROM grams2 GROUP BY ngram),
top AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_freq DESC, ngram ASC) AS rnk,
         ngram, doc_freq
  FROM counts
  ORDER BY doc_freq DESC, ngram ASC
  LIMIT 50
),
grams3 AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS ngram
  FROM tok, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i)
),
bench AS (SELECT DISTINCT ngram FROM grams3 WHERE doc_id < 5),
cont AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM grams3 g JOIN bench b ON g.ngram = b.ngram
  WHERE g.doc_id >= 5
  GROUP BY g.doc_id
  HAVING count(*) >= 2
)
SELECT 'top_ngrams' AS kind, ngram AS key,
       CAST(rnk AS BIGINT) AS metric_a, CAST(doc_freq AS BIGINT) AS metric_b
FROM top
UNION ALL
SELECT 'contamination' AS kind, doc_id::VARCHAR AS key,
       CAST(n_hits AS BIGINT) AS metric_a, NULL::BIGINT AS metric_b
FROM cont
""",
        "q_stratified_sample": """
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT / 268435456.0 AS u,
         CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
                   WHEN 'es' THEN 0.25 WHEN 'zh' THEN 1.0 END AS frac
  FROM documents
) x
WHERE frac IS NOT NULL AND u < frac
""",
        "q_pack_sequences": """
WITH base AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS n_tokens,
         doc_id % 64 AS shard
  FROM documents
),
cums AS (
  SELECT doc_id, n_tokens, shard,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
SELECT doc_id, n_tokens, shard,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_offset
FROM cums
""",
        "q_curate_corpus": _MINHASH_CTES.replace("WITH docs", "WITH RECURSIVE docs", 1)
        + f""",
verified AS (
  SELECT id_a, id_b FROM inter
  WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, reach.r FROM edges e JOIN reach ON e.src = reach.id
),
clusters AS (
  SELECT id AS doc_id, (id = min(r)) AS keep FROM reach GROUP BY id
),
quality AS (
  SELECT doc_id, len(t) AS n_tokens,
         round((least(len(t), 100) / 100.0
                + len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) / len(t)
                + len(list_distinct(t)) / len(t)) / 3, 4) AS quality_score
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+', 0) AS t
        FROM documents) x
)
SELECT q.doc_id, q.n_tokens, q.quality_score
FROM quality q LEFT JOIN clusters c ON q.doc_id = c.doc_id
WHERE q.quality_score >= 0.3 AND COALESCE(c.keep, TRUE)
""",
        "q_dedup_ngram_jaccard": _DOCS_SHINGLES_CTE
        + f""",
ex0 AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS sh
  FROM docs WHERE len(shingles) > 0
),
freq_ok AS (
  SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= {_NGRAM_MAX_SHINGLE_FREQ}
),
ex AS (SELECT ex0.* FROM ex0 JOIN freq_ok USING (sh)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter,
         min(a.n_sh) AS n_a, min(b.n_sh) AS n_b
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, n_inter * 1.0 / (n_a + n_b - n_inter) AS jaccard
FROM inter
WHERE n_inter * 1.0 / (n_a + n_b - n_inter) >= {_NGRAM_THRESHOLD}
""",
        "q_dedup_simhash_pairs": "WITH fp AS (SELECT doc_id, "
        + DD.simhash_sql("text")
        + f""" AS simhash FROM documents),
slices AS (
  SELECT doc_id, simhash, band_id,
         substr(simhash, CAST(band_id * 8 + 1 AS INT), 8) AS piece
  FROM fp, (SELECT unnest(range(0, 4)) AS band_id) b
),
freq_ok AS (
  SELECT band_id, piece FROM slices
  GROUP BY band_id, piece HAVING count(*) <= {_SIMHASH_MAX_BAND_FREQ}
),
slices_ok AS (SELECT s.* FROM slices s JOIN freq_ok USING (band_id, piece)),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sa, b.simhash AS sb
  FROM slices_ok a
  JOIN slices_ok b ON a.band_id = b.band_id AND a.piece = b.piece
              AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       len(list_filter(range(1, 33), i -> substr(sa, CAST(i AS INT), 1)
           <> substr(sb, CAST(i AS INT), 1))) AS hamming
FROM pairs
WHERE len(list_filter(range(1, 33), i -> substr(sa, CAST(i AS INT), 1)
          <> substr(sb, CAST(i AS INT), 1))) <= 6
""",
        # incremental == full re-run restricted to pairs touching the
        # batch (vec_id % 5 = 0) — the embedding dedup index's contract
        "q_dedup_emb_incremental": _emb_lsh_sql(
            _EMB_LSH_PLANES, _EMB_LSH_BANDS, _EMB_DIM, _COSINE_DEDUP_THRESHOLD
        )
        + "  AND (id_a % 5 = 0 OR id_b % 5 = 0)\n",
        "q_dedup_embedding": _emb_lsh_sql(
            _EMB_LSH_PLANES, _EMB_LSH_BANDS, _EMB_DIM, _COSINE_DEDUP_THRESHOLD
        ),
        "q_semantic_dedup": _semantic_dedup_sql(
            _SEMD_K, _EMB_DIM, _COSINE_DEDUP_THRESHOLD
        ),
        # binary metadata (formerly q_mm_binary_meta) + decode pass +
        # frame sampling (formerly q_mm_frame_sample, merged round 10):
        # per-(asset, frame) grain carrying every decode/meta column
        "q_mm_decode_meta": """
WITH meta AS (
  SELECT doc_id AS asset_id,
         'application/octet-stream' AS media_type,
         octet_length(encode(text)) AS byte_len,
         sha256(text) AS content_sha256,
         upper(hex(encode(substring(text, 1, 4)))) AS magic_bytes,
         16 + octet_length(encode(text)) % 16 AS width,
         16 + (octet_length(encode(text)) // 7) % 16 AS height,
         3 AS n_channels,
         (16 + octet_length(encode(text)) % 16)
           * (16 + (octet_length(encode(text)) // 7) % 16) * 3 AS n_pixel_bytes,
         'fake' AS codec
  FROM documents
),
frames AS (
  SELECT asset_id, frame_index, frame_index * 4096 AS frame_offset
  FROM (
    SELECT doc_id AS asset_id,
           unnest(range(0, least(8, octet_length(encode(text)) // 4096 + 1)))
             AS frame_index
    FROM documents
  ) x
)
SELECT f.asset_id, f.frame_index, f.frame_offset,
       m.media_type, m.byte_len, m.content_sha256, m.magic_bytes,
       m.width, m.height, m.n_channels, m.n_pixel_bytes, m.codec
FROM frames f JOIN meta m ON f.asset_id = m.asset_id
""",
        "q_mm_dedup_binary": """
SELECT substring(sha256(substring(text, 1, 100)), 1, 16) AS fingerprint,
       count(*) AS n_assets, min(doc_id) AS keep_id
FROM documents
GROUP BY substring(sha256(substring(text, 1, 100)), 1, 16)
HAVING count(*) > 1
""",
        "q_running_totals": """
SELECT user_id, event_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_so_far,
       round(CAST(sum(value) OVER w AS DOUBLE), 6) AS total_so_far,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id ASC) AS BIGINT)
         AS value_rank_in_user
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS UNBOUNDED PRECEDING)
""",
        "q_asof_join": """
WITH p AS (
  SELECT user_id, ts, max_by(value, event_id) AS last_purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type <> 'purchase'
)
SELECT l.event_id, l.user_id, l.ts, p.last_purchase_value
FROM l ASOF LEFT JOIN p
  ON l.user_id = p.user_id AND l.ts >= p.ts
""",
        "q_range_join": """
WITH ivals AS (
  SELECT DISTINCT event_type,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS start_ts,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 2 DAY AS end_ts
  FROM events
)
SELECT e.event_id, e.event_type, e.ts, i.start_ts, i.end_ts
FROM events e JOIN ivals i
  ON e.event_type = i.event_type
 AND e.ts >= i.start_ts AND e.ts < i.end_ts
""",
        "q_stream_windowed_agg": """
SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000)
         AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "q_sessionize": """
WITH flags AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flags
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM sess
GROUP BY user_id, sid
""",
        # merged brute + IVF oracle (round 13): both methods share the
        # query set; the IVF leg re-derives the probed buckets exactly
        # like the Spark operator (first-vector-per-label centroids)
        "q_ann_cosine_topk": _EMB_V_CTE
        + f"""
, q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
scored_b AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.qv", b="v.v")} AS cosine
  FROM q, v WHERE v.vec_id <> q.query_id
),
rb AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored_b
),
cents AS (
  SELECT label AS centroid_id, v AS cv
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id) AS rn FROM v) z
  WHERE rn = 1
),
qc AS (
  SELECT q.query_id, q.qv, cents.centroid_id,
         {_COS_SQL.format(a="q.qv", b="cents.cv")} AS ccos
  FROM q, cents
),
probes AS (
  SELECT query_id, qv, centroid_id AS bucket
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY ccos DESC, centroid_id ASC) AS crank
        FROM qc) z
  WHERE crank <= 2
),
scored_i AS (
  SELECT p.query_id, v.vec_id AS neighbor_id,
         {_COS_SQL.format(a="p.qv", b="v.v")} AS cosine
  FROM probes p JOIN v ON v.label = p.bucket AND v.vec_id <> p.query_id
),
ri AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rnk
  FROM scored_i
)
SELECT query_id, rnk, neighbor_id, cosine, 'brute' AS method
FROM rb WHERE rnk <= 10
UNION ALL
SELECT query_id, rnk, neighbor_id, cosine, 'ivf' AS method
FROM ri WHERE rnk <= 10
""",
        # materialized ANN index search (round 7): deterministic iters=0
        # artifacts — centroids = the 4 lowest-id vectors, codebooks =
        # their 4 subvector slices — then the full IVFPQ recipe in SQL:
        # bucket-assign every corpus vector (min squared L2, lowest-cid
        # ties), PQ-encode per subspace, pick each query's 2 nearest
        # coarse buckets, asymmetric-distance score ONLY the probed
        # buckets' rows, rank by (adc ASC, neighbor ASC), keep 10
        "q_ann_index_search": _EMB_V_CTE
        + """
, seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id ASC) - 1 AS cid
  FROM v ORDER BY vec_id ASC LIMIT 4
),
cb AS (
  SELECT s.sub, seeds.cid AS code, seeds.v[s.sub * 16 + 1 : s.sub * 16 + 16] AS cv
  FROM seeds CROSS JOIN (SELECT unnest(range(4)) AS sub) s
),
bas AS (
  SELECT v.vec_id, seeds.cid,
         list_sum(list_transform(range(1, 65),
           i -> (v.v[i] - seeds.v[i]) * (v.v[i] - seeds.v[i]))) AS d
  FROM v CROSS JOIN seeds
),
bkt AS (
  SELECT vec_id, cid AS bucket FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rk
    FROM bas) z
  WHERE rk = 1
),
encsc AS (
  SELECT v.vec_id, c.sub, c.code,
         list_sum(list_transform(range(1, 17),
           i -> (v.v[c.sub * 16 + i] - c.cv[i]) * (v.v[c.sub * 16 + i] - c.cv[i]))) AS d
  FROM v CROSS JOIN cb c
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d ASC, code ASC) AS rk
    FROM encsc) z
  WHERE rk = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
qc AS (
  SELECT q.query_id, q.qv, seeds.cid,
         list_sum(list_transform(range(1, 65),
           i -> (q.qv[i] - seeds.v[i]) * (q.qv[i] - seeds.v[i]))) AS d
  FROM q CROSS JOIN seeds
),
probes AS (
  SELECT query_id, qv, cid AS bucket FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY d ASC, cid ASC) AS crank
    FROM qc) z
  WHERE crank <= 2
),
dtab AS (
  SELECT p.query_id, p.bucket, c.sub, c.code,
         list_sum(list_transform(range(1, 17),
           i -> (p.qv[c.sub * 16 + i] - c.cv[i]) * (p.qv[c.sub * 16 + i] - c.cv[i]))) AS d
  FROM probes p CROSS JOIN cb c
),
adc AS (
  SELECT d.query_id, e.vec_id AS neighbor_id, round(sum(d.d), 6) AS adc_dist
  FROM enc e
  JOIN bkt b ON b.vec_id = e.vec_id
  JOIN dtab d ON d.bucket = b.bucket AND d.sub = e.sub AND d.code = e.code
  GROUP BY d.query_id, e.vec_id
)
SELECT query_id, rnk, neighbor_id, adc_dist FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
  FROM adc) z
WHERE rnk <= 10
""",
        # L2-normalize + int8 quantize + PQ encode (deterministic iters=0
        # codebook = subvector slices of the 4 lowest-id vectors), all
        # map-side over v; arrays rendered as canonical CSV so the
        # driver's pandas canonicalizer (which cannot sort array cells)
        # can hash the row
        "q_emb_transform": _EMB_V_CTE
        + """
, seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id ASC) - 1 AS code
  FROM v ORDER BY vec_id ASC LIMIT 4
),
cb AS (
  SELECT s.sub, seeds.code, seeds.v[s.sub * 16 + 1 : s.sub * 16 + 16] AS cv
  FROM seeds CROSS JOIN (SELECT unnest(range(4)) AS sub) s
),
scored AS (
  SELECT v.vec_id, c.sub, c.code,
         list_sum(list_transform(range(1, 17),
           i -> (v.v[c.sub * 16 + i] - c.cv[i]) * (v.v[c.sub * 16 + i] - c.cv[i])))
           AS d
  FROM v CROSS JOIN cb c
),
best AS (
  SELECT vec_id, sub, code,
         row_number() OVER (PARTITION BY vec_id, sub
                            ORDER BY d ASC, code ASC) AS rk
  FROM scored
),
enc AS (
  SELECT vec_id,
         string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub ASC) AS pq_codes_csv
  FROM best WHERE rk = 1 GROUP BY vec_id
)
SELECT s.vec_id,
       array_to_string(list_transform(s.v,
         x -> printf('%.6f', round(x / sqrt(list_sum(list_transform(s.v, y -> y * y))), 6))), ',')
         AS embedding_unit_csv,
       array_to_string(list_transform(s.v,
         x -> CAST(CAST(floor(x * (127.0 / amax) + 0.5) AS BIGINT) AS VARCHAR)), ',')
         AS q_codes_csv,
       round(127.0 / amax, 6) AS q_scale,
       enc.pq_codes_csv
FROM (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS amax
      FROM v) s JOIN enc ON s.vec_id = enc.vec_id
""",
    }
