"""Distributed commit-log reads: the files-backed log as a DataFrame.

The commit log is one JSON document per commit (Delta-log style,
≙ JsonCodecs.scala:18-135 + FileBackedVersionTracker.scala:157-175 for
the document shape), so the LIVE log has always been readable with
``spark.read.json`` over a glob.  After :meth:`archive_commits` (round
12/13) the packed history lives inside ``archive_*.json`` chunk
artifacts whose ``entries`` are uniform ``{"s": seq, "u": <commit doc>}``
structs — typable by Spark's schema'd JSON reader — and this module is
what keeps "the archive is the log relocated" true for the DISTRIBUTED
read path too: :func:`commit_log_df` merges live files and archived
chunks into one DataFrame with identical columns, so log analytics
(audit trails, commit-rate dashboards, op-mix reports over years of
history) scan the log with executors instead of folding it on the
driver.

Scale notes (the reason this is not just ``spark.read.json`` on one
glob):

* explicit schemas everywhere — ``inferSchema`` over a 10⁶-commit log
  is a full extra pass;
* the archived side reads O(history/max_chunk_bytes) chunk files whose
  entries explode executor-side (no driver materialization; a 300 MB
  log never touches the driver);
* crash-leftover duplicate slots hold identical commits by the floor
  protocol and are named by the LISTING alone — a commit both live and
  archived (the instant between an archive write and its deletes), or
  in two OVERLAPPING chunk artifacts (a consolidation crash before its
  deletes) — deduped by seq preferring the live copy, the same rule as
  the driver-side ``_merged_updates``;
* ``seq`` (the commit-file sequence / filename timestamp) rides along,
  so incremental consumers can filter ``seq > last_seen`` and commit
  order is a plain ``ORDER BY seq``.

The log directory must be visible to Spark's Hadoop filesystem layer
(local paths, s3a://, hdfs://, ...) — ``memory://`` test stores are
process-local and refused loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.model import TableName
from ..trackers.files import (
    _ARCHIVE_FILE_RE,
    _UPDATE_FILE_RE,
    FileBackedVersionTracker,
    _archive_first_seq,
)

#: One operation inside a commit document (ops.py to_dict shapes: the
#: union of add-partition-version / remove-partition / add-table-version
#: / init-table fields; absent fields read as NULL).
OPERATION_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("partition", StringType()),
        StructField("version", StringType()),
        StructField("table_name", StringType()),
        StructField("is_snapshot", BooleanType()),
    ]
)

#: A full commit document (update_to_json / JsonCodecs.scala parity).
UPDATE_JSON_SCHEMA = StructType(
    [
        StructField("commit_id", StringType()),
        StructField("user_id", StringType()),
        StructField("message", StringType()),
        StructField("timestamp", StringType()),
        StructField("operations", ArrayType(OPERATION_SCHEMA)),
    ]
)

_ARCHIVE_BODY_SCHEMA = StructType(
    [
        StructField("format", IntegerType()),
        StructField("first_seq", LongType()),
        StructField("last_seq", LongType()),
        StructField("n", IntegerType()),
        StructField(
            "entries",
            ArrayType(
                StructType(
                    [
                        StructField("s", LongType()),
                        StructField("u", UPDATE_JSON_SCHEMA),
                    ]
                )
            ),
        ),
    ]
)


#: commit_log_df's full output schema (the JSON doc columns + seq +
#: archived) — also the exact shape :func:`export_commit_log` spools.
def _full_schema() -> StructType:
    # fresh StructType per call: StructType.add mutates in place
    return StructType(
        UPDATE_JSON_SCHEMA.fields
        + [
            StructField("seq", LongType()),
            StructField("archived", BooleanType()),
        ]
    )


def export_commit_log(
    tracker,
    table: TableName,
    dest_dir: str,
    batch_commits: int = 5000,
) -> int:
    """Spool a tracker's commit log to PARQUET files shaped exactly like
    :func:`commit_log_df`'s output, returning the commit count.

    The sqlite backend's answer to distributed log analytics (round-14
    decision): a serializable single-file DB lives on ONE node, so
    executors cannot scan it in place — no JDBC driver ships here, and
    even with one the file is driver-local.  Instead, ONE streamed
    driver-side pass (``batch_commits`` commits of memory at a time,
    never the whole log) relocates the log to a Spark-visible store;
    every later analytics run over the spool is fully distributed.
    Backend-agnostic: works for any tracker with seq-range reads (on the
    files tracker it reads transparently through archive chunks), though
    the files layout is better served by :func:`commit_log_df` directly
    (zero relocation).  ``archived`` is spooled as False throughout —
    the spool IS one relocated log; the column exists for schema parity.

    ``dest_dir`` must be a LOCAL/shared-POSIX path the executors can
    also read (NFS, a mounted lakehouse volume) — the writer uses plain
    ``os``/pyarrow file APIs, so object-store URIs are refused loudly
    rather than half-working (``os.makedirs('s3://…')`` would create a
    bogus local directory while the Spark read needs the s3a scheme;
    spool to shared POSIX storage, or distcp the spool afterwards).  It
    must also not already contain files (a stale half-spool must never
    silently mix with a fresh one)."""
    import os
    import re as _re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..core.ops import update_to_dict

    if _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", dest_dir):
        raise ValueError(
            f"export_commit_log writes with local file APIs; dest_dir "
            f"{dest_dir!r} is a URI — spool to a shared-POSIX path the "
            "executors can read (NFS/mounted volume), then read it "
            "there (or copy the spool to the object store yourself)"
        )
    if os.path.isdir(dest_dir) and os.listdir(dest_dir):
        raise ValueError(
            f"export_commit_log dest_dir {dest_dir!r} is not empty — "
            "spool to a fresh directory (stale spools must not mix)"
        )
    os.makedirs(dest_dir, exist_ok=True)
    op_t = pa.struct(
        [
            ("type", pa.string()),
            ("partition", pa.string()),
            ("version", pa.string()),
            ("table_name", pa.string()),
            ("is_snapshot", pa.bool_()),
        ]
    )
    arrow_schema = pa.schema(
        [
            ("commit_id", pa.string()),
            ("user_id", pa.string()),
            ("message", pa.string()),
            ("timestamp", pa.string()),
            ("operations", pa.list_(op_t)),
            ("seq", pa.int64()),
            ("archived", pa.bool_()),
        ]
    )
    op_keys = ("type", "partition", "version", "table_name", "is_snapshot")
    seqs = tracker.update_seqs(table)
    total = 0
    for chunk_no, i in enumerate(range(0, len(seqs), batch_commits)):
        chunk = seqs[i:i + batch_commits]
        lo = chunk[0] - 1 if i == 0 else seqs[i - 1]
        updates = tracker.updates_in_seq_range(table, lo, chunk[-1])
        rows = []
        for seq, u in zip(chunk, updates):
            d = update_to_dict(u)
            d["operations"] = [
                {k: op.get(k) for k in op_keys} for op in d["operations"]
            ]
            d["seq"] = seq
            d["archived"] = False
            rows.append(d)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=arrow_schema),
            os.path.join(dest_dir, f"commits_{chunk_no:06d}.parquet"),
        )
        total += len(rows)
    return total


def commit_log_df(
    spark: SparkSession,
    tracker: FileBackedVersionTracker,
    table: TableName,
    spool_dir: "str | None" = None,
) -> DataFrame:
    """The table's FULL commit log — archived chunks + live files — as a
    DataFrame ``(seq, archived, commit_id, user_id, message, timestamp,
    operations)``, one row per commit, ordered by ``seq`` when sorted.

    Requires a files-backed tracker over a Spark-visible store — or a
    sqlite tracker WITH ``spool_dir`` (one streamed driver-side export
    relocates the driver-local DB's log to parquet the executors can
    scan; see :func:`export_commit_log`).  Raises ``ValueError`` for
    other trackers / process-local stores / a sqlite tracker without a
    spool target, and for
    pre-round-13 archive artifacts (legacy blob names: their
    tuple-shaped entries would parse as NULL under the struct schema —
    dropping them silently would hide committed history; run
    ``archive_commits(consolidate=True)`` once to rewrite them).  One
    directory listing decides which side(s) exist; both sides read with
    explicit schemas.

    Concurrency: the returned plan snapshots the directory at call time.
    An ``archive_commits`` run racing a later ACTION on it can delete a
    listed file mid-scan — Spark then fails that action loudly
    (``ignoreMissingFiles`` is pinned false on both reads precisely so a
    session-level true cannot turn the race into silently missing
    commits); re-call this function for a fresh snapshot, the same
    retry-from-a-fresh-listing rule as the driver-side surfaces.  Run
    log analytics outside the archival maintenance window, or on a
    tracker nobody is archiving."""
    if not isinstance(tracker, FileBackedVersionTracker):
        from ..trackers.sqlite import SqliteVersionTracker

        if isinstance(tracker, SqliteVersionTracker):
            # round-14 decision (docs/scale.md "sqlite log analytics"):
            # the serializable single-file DB is driver-local — no
            # in-place distributed scan exists.  One streamed spool
            # relocates it; the read over the spool is distributed.
            if spool_dir is None:
                raise ValueError(
                    "the sqlite log is a driver-local single-file DB — "
                    "executors cannot scan it in place.  Pass "
                    "spool_dir=<Spark-visible dir> to relocate it via "
                    "ONE streamed export (export_commit_log) and read "
                    "the spool distributed (docs/scale.md, 'sqlite log "
                    "analytics')"
                )
            export_commit_log(tracker, table, spool_dir)
            return (
                spark.read.schema(_full_schema())
                .option("ignoreMissingFiles", "false")
                .parquet(spool_dir)
            )
        raise ValueError(
            "commit_log_df reads the files-backed log layout; the "
            f"{type(tracker).__name__} has no file log to scan"
        )
    from ..trackers.fs import MemoryFileSystem

    if isinstance(tracker.fs, MemoryFileSystem):
        raise ValueError(
            "memory:// stores are process-local — Spark executors "
            "cannot see them; use a local path or an object store"
        )
    d = tracker._table_dir(table)
    # Spark's Hadoop layer has no handler for the bare "s3" scheme the
    # tracker's object-store backends use — map to s3a (the standard
    # hadoop-aws connector scheme) so the same tracker config serves
    # both the driver-side log and the distributed read; executors still
    # need hadoop-aws on the classpath, which fails loudly if absent
    spark_d = "s3a://" + d[len("s3://"):] if d.startswith("s3://") else d
    names = tracker.fs.list_dir(d)
    live_seqs = sorted(
        int(m.group(1)) for n in names if (m := _UPDATE_FILE_RE.match(n))
    )
    has_live = bool(live_seqs)
    arch_names = [n for n in names if _ARCHIVE_FILE_RE.match(n)]
    # pre-format-3 artifacts are exactly the legacy blob names (no
    # first- part) — decidable from the listing already in hand, no
    # archive bytes read (a Spark pass just to check `format` would
    # scan O(archived history) twice per call)
    stale = [n for n in arch_names if _archive_first_seq(n) is None]
    if stale:
        raise ValueError(
            f"{len(stale)} archive artifact(s) predate the "
            "Spark-readable entry format — run "
            "archive_commits(consolidate=True) once to rewrite them, "
            "then re-read"
        )
    parts = []
    if has_live:
        parts.append(
            spark.read.schema(UPDATE_JSON_SCHEMA)
            .option("ignoreMissingFiles", "false")
            .json(tracker.fs.join(spark_d, "table_update_*.json"))
            .withColumn(
                "seq",
                F.regexp_extract(
                    F.input_file_name(), r"table_update_(\d+)\.json", 1
                ).cast("long"),
            )
            .withColumn("archived", F.lit(False))
        )
    if arch_names:
        raw = (
            spark.read.schema(_ARCHIVE_BODY_SCHEMA)
            .option("ignoreMissingFiles", "false")
            .json(tracker.fs.join(spark_d, "archive_*.json"))
        )
        parts.append(
            raw.select(F.explode("entries").alias("e"))
            .select(
                # belt to the name check above: an entry that fails the
                # struct parse (a tuple-shaped body under a ranged name
                # — no released writer produced one) must fail the scan,
                # never explode into a silently absent commit
                F.when(
                    F.col("e.u.commit_id").isNull(),
                    F.raise_error(F.lit(
                        "archive entry failed the struct parse — "
                        "non-format-3 body; consolidate to rewrite"
                    )),
                ).otherwise(F.col("e.u.commit_id")).alias("commit_id"),
                F.col("e.u.user_id").alias("user_id"),
                F.col("e.u.message").alias("message"),
                F.col("e.u.timestamp").alias("timestamp"),
                F.col("e.u.operations").alias("operations"),
                F.col("e.s").alias("seq"),
                F.lit(True).alias("archived"),
            )
        )
    if not parts:
        return spark.createDataFrame([], _full_schema())
    out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    if not arch_names:
        return out
    # Crash-leftover duplicates hold IDENTICAL commits (commit files and
    # archive entries are immutable copies of the same doc) and occupy a
    # seq set the directory LISTING already names — two classes:
    #  * a commit both live and archived, for the instant between an
    #    archive's chunk writes and its deletes: exactly the live seqs
    #    at-or-below the highest archived seq;
    #  * a commit in TWO chunk artifacts, left by a consolidation crash
    #    (new chunks written, old generation not yet deleted — the state
    #    archive_commits' step-0 disjoint-cover repair removes): exactly
    #    the intervals where two name-carried [first, last] spans
    #    intersect (the _archives_overlap rule; legacy unbounded names
    #    were refused above, so every span is known from its name).
    # The common no-crash case has neither: plain union, no shuffle.
    # With leftovers, only the rows in those seqs ride the dedup window
    # (live wins, then any archived copy — rows are identical); shuffling
    # the whole 10⁶-commit log by seq to dedup a handful of slots would
    # put a full-log Exchange on every read.
    bounds = sorted(
        (int(m.group("first")), int(m.group("last")))
        for n in arch_names
        if (m := _ARCHIVE_FILE_RE.match(n))
    )
    arch_last = bounds[-1][1] if bounds else None
    overlaps = []  # merged intervals covered by >= 2 artifacts
    reach = None  # furthest last-seq among spans started so far
    for first, last in bounds:
        if reach is not None and first <= reach:
            lo, hi = first, min(last, reach)
            if overlaps and lo <= overlaps[-1][1]:
                overlaps[-1] = (overlaps[-1][0], max(overlaps[-1][1], hi))
            else:
                overlaps.append((lo, hi))
        reach = last if reach is None else max(reach, last)
    dup_seqs = [s for s in live_seqs if s <= arch_last]
    if not dup_seqs and not overlaps:
        return out
    from pyspark.sql.window import Window

    dup_pred = F.lit(False)
    if dup_seqs:
        dup_pred = dup_pred | F.col("seq").isin(dup_seqs)
    for lo, hi in overlaps:
        dup_pred = dup_pred | F.col("seq").between(lo, hi)
    clean = out.where(~dup_pred)
    dups = out.where(dup_pred)
    w = Window.partitionBy("seq").orderBy(F.col("archived").asc())
    deduped = (
        dups.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return clean.unionByName(deduped)
