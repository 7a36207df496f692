"""Lake-native ANN index: the IVF/PQ search family materialized ON the
versioned lake, so probes prune at the SCAN.

This is where the two halves of the engine meet.  The in-memory
:func:`~chronicles_spark.operators.similarity.ivfpq_topk` re-encodes the
corpus from raw embeddings on every call and can only prune via a join;
here the encoded corpus ``(vec_id, pq_codes)`` is written ONCE as a
versioned table partitioned by the coarse-quantizer ``bucket`` (through
the ordinary :func:`~chronicles_spark.spark.writer.versioned_insert_into`
commit path), and each search resolves its probed buckets to concrete
live ``bucket=<b>/_version=<label>`` directories through the same
driver-side partition selection the versioned reader uses — unprobed
buckets are never listed, never opened, never read.  At 100 TB with
n_probe/n_clusters = 2/1024 a query batch reads ~0.2% of the index.

Structural-pruning stance shared with the reference's metastore reads
(spark/src/main/scala/dev/chronicles/spark/SparkHiveMetastore.scala:58-61:
partition LOCATIONs select what a read sees); the index build is a plain
versioned write, so it inherits commit atomicity, time travel, branches,
rollback and vacuum for free — an index rebuild is an ordinary commit and
a bad rebuild is one ``checkout`` away from undone.

Fit artifacts (coarse centroids + PQ codebooks, metadata-scale: k·dim +
k_sub·dim doubles) are stored as a JSON sidecar next to the data, named
by the DATA VERSION label (``_ann_artifacts_<label>.json``), so every
committed index version pins exactly the artifacts that encoded it —
time-traveling the table to an older version finds that version's
artifacts under the same naming rule.  Sidecars of vacuumed versions
become inert orphan files (bytes: ~k_sub·dim floats as text; harmless,
and removable with the same sweep that removes orphan data directories).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.model import PartitionedTableVersion, TableDefinition
from ..core.version import generate_version
from ..trackers.base import VersionTracker
from ..trackers.fs import filesystem_for
from . import similarity as SIM

ARTIFACT_PREFIX = "_ann_artifacts_"
BUCKET_COL = "bucket"


@dataclass(frozen=True)
class AnnArtifacts:
    """The metadata-scale fit outputs an index version pins: coarse
    centroids ``[(cid, vec), ...]`` and PQ ``codebooks[sub][code] ->
    subvector``, plus the data-version label they encoded."""

    centroids: tuple
    codebooks: tuple
    version_label: str

    def to_json(self) -> str:
        return json.dumps(
            {
                "version_label": self.version_label,
                "centroids": [[cid, list(c)] for cid, c in self.centroids],
                "codebooks": [
                    [list(c) for c in cb] for cb in self.codebooks
                ],
            }
        )

    @staticmethod
    def from_json(text: str) -> "AnnArtifacts":
        d = json.loads(text)
        return AnnArtifacts(
            centroids=tuple((int(cid), tuple(c)) for cid, c in d["centroids"]),
            codebooks=tuple(
                tuple(tuple(c) for c in cb) for cb in d["codebooks"]
            ),
            version_label=d["version_label"],
        )

    @property
    def centroid_list(self) -> list:
        return [(cid, list(c)) for cid, c in self.centroids]

    @property
    def codebook_list(self) -> list:
        return [[list(c) for c in cb] for cb in self.codebooks]


def _artifact_path(table: TableDefinition, label: str):
    fs, root = filesystem_for(table.location)
    return fs, fs.join(root, ARTIFACT_PREFIX + label + ".json")


def _write_artifact_sidecar(
    table: TableDefinition, version_label: str, centroids, codebooks
) -> AnnArtifacts:
    """Stamp + persist the artifact sidecar for a version BEFORE its data
    commit — a crash leaves an orphan sidecar (reclaimable via
    :func:`vacuum_ann_artifacts`'s age guard), never a committed index
    whose artifacts are missing."""
    stamped = AnnArtifacts(
        centroids=tuple((cid, tuple(c)) for cid, c in centroids),
        codebooks=tuple(tuple(tuple(x) for x in cb) for cb in codebooks),
        version_label=version_label,
    )
    fs, apath = _artifact_path(table, version_label)
    fs.mkdirs(fs.join(*apath.rsplit("/", 1)[:1]))  # first build: no dir yet
    fs.write_text(apath, stamped.to_json())
    return stamped


def build_ann_index(
    df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "ann",
    message: str = "build ann index",
    n_clusters: int = 8,
    m: int = 8,
    k_sub: int = 16,
    iters: int = 3,
    train_fraction: "float | None" = None,
    centroids: "list | None" = None,
    codebooks: "list | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
):
    """Fit (or reuse injected) IVF centroids + PQ codebooks, encode the
    corpus, and PUBLISH it as a versioned table partitioned by ``bucket``.

    Returns ``(table_version, AnnArtifacts)``.  ``table`` must be
    partitioned by exactly (``bucket``,) and already ``init_table``-ed on
    the tracker.  Injecting ``centroids``/``codebooks`` re-encodes under
    an EXISTING quantizer (periodic refresh without drifting bucket
    geometry between builds); omitted artifacts are fit here
    (``train_fraction`` samples the training set — see
    :func:`~chronicles_spark.operators.similarity.kmeans_fit`).

    Scale shape: after the fits, ONE map-side pass over a single corpus
    scan assigns the bucket and PQ-encodes (no self-join recombine); the
    write shuffles nothing beyond what ``partitionBy`` needs, and the
    commit is O(#buckets) metadata.  The artifact sidecar (k_sub·dim
    floats) is written BEFORE the data commit under the pre-generated
    version label — a crash leaves an orphan sidecar and invisible data
    directories, never a committed index whose artifacts are missing.

    Storing ``pq_codes`` instead of raw vectors is the PQ compression
    claim on disk: D float32 -> m small ints (e.g. 768×4B -> 8×1B), so
    the whole searchable index is ~1/100 the corpus bytes and a full
    index scan (the n_probe = n_clusters worst case) reads ~1% of what
    a brute-force pass over raw embeddings would."""
    if tuple(table.partition_schema.columns) != (BUCKET_COL,):
        raise ValueError(
            f"ANN index table must be partitioned by ({BUCKET_COL!r},), "
            f"got {table.partition_schema.columns}"
        )
    if centroids is not None or codebooks is not None:
        # only injected artifacts need the dim probe; the fit-here path
        # derives dims from the data and raises its own clearer errors
        SIM.validate_ann_artifacts(df, vec_col, centroids, codebooks)
    if centroids is None:
        centroids = SIM.kmeans_fit(
            df, n_clusters, iters, id_col, vec_col, train_fraction=train_fraction
        )
    if codebooks is None:
        codebooks = SIM.pq_fit(
            df, m, k_sub, iters, id_col, vec_col, train_fraction=train_fraction
        )

    vd = df.select(F.col(id_col), SIM.as_double(F.col(vec_col)).alias("v"))
    encoded = SIM.pq_encode(
        SIM._assign_nearest(vd, centroids).withColumnRenamed("cluster", BUCKET_COL),
        codebooks,
        id_col=id_col,
        vec_col="v",
        keep_cols=True,
    ).select(
        F.col(id_col),
        F.col(BUCKET_COL).cast("string").alias(BUCKET_COL),
        "pq_codes",
    )

    from ..spark.writer import versioned_insert_into

    version = generate_version()
    artifacts = _write_artifact_sidecar(
        table, version.label, centroids, codebooks
    )
    state, _ = versioned_insert_into(
        encoded, table, tracker, user_id, message,
        version=version, metastore=metastore,
    )
    return state, artifacts


def load_ann_artifacts(
    table: TableDefinition, table_version
) -> AnnArtifacts:
    """Artifacts pinned by a resolved index state.

    A full rebuild leaves every live partition at one version label; an
    :func:`extend_ann_index` upsert leaves TOUCHED buckets at a newer
    label than untouched ones.  Both are valid index states as long as
    every live label's sidecar carries the SAME quantizer (extend writes
    its sidecar with the artifacts it encoded under, so this holds by
    construction).  The loader therefore reads each distinct label's
    sidecar and requires the artifact payloads to AGREE — disagreement
    means the table mixes data encoded under different quantizers (a
    write outside this module, or a partial-rollback interleaving) and
    no single artifact set can score it: pass ``artifacts=`` explicitly
    after deciding which geometry is right, or rebuild.  Returns the
    artifacts stamped with the NEWEST live label.

    Cost: one sidecar read + payload comparison per DISTINCT live label
    — bounded by the number of extends since the last full rebuild (a
    rebuild collapses every bucket to one label), all driver-side
    metadata.  Latency-sensitive repeat callers (the streaming sink's
    per-batch default) should pass ``artifacts=`` and skip resolution."""
    if not isinstance(table_version, PartitionedTableVersion):
        raise ValueError("ANN index tables are partitioned by bucket")
    labels = sorted({v.label for v in table_version.partition_versions.values()})
    if not labels:
        raise ValueError(f"table {table.name} has no live index data")
    loaded: list[AnnArtifacts] = []
    for label in labels:
        fs, apath = _artifact_path(table, label)
        if not fs.exists(apath):
            raise ValueError(
                f"no artifact sidecar for live index version {label} at "
                f"{apath}"
            )
        loaded.append(AnnArtifacts.from_json(fs.read_text(apath)))
    first = loaded[0]
    for other in loaded[1:]:
        if (
            other.centroids != first.centroids
            or other.codebooks != first.codebooks
        ):
            raise ValueError(
                f"table {table.name} has live partitions encoded under "
                f"DIFFERENT quantizers (labels {labels}) — pass artifacts= "
                "explicitly or rebuild the index"
            )
    return AnnArtifacts(
        centroids=first.centroids,
        codebooks=first.codebooks,
        version_label=labels[-1],
    )


def extend_ann_index(
    df_new: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "ann",
    message: str = "extend ann index",
    artifacts: "AnnArtifacts | None" = None,
    mode: str = "upsert",
    concurrency: str = "optimistic",
    exclusive: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
):
    """Incremental write into a materialized ANN index: encode ONLY the
    new/changed vectors under the index's EXISTING quantizer and publish
    fresh versions for exactly the touched buckets.  Returns
    ``(table_version, AnnArtifacts)`` — artifacts unchanged, re-stamped
    under the new version label so :func:`load_ann_artifacts`'s
    sidecar-per-label agreement contract keeps holding.

    ``mode="upsert"`` (default): rows whose id already exists anywhere in
    the index are REPLACED.  Old rows are located with one column-pruned
    scan of the whole index (only (id, bucket) — a PQ index is ~1/100
    the corpus bytes and the scan reads two int columns of it) filtered
    map-side against the broadcast new-id set, so a replacement whose
    new embedding lands in a DIFFERENT coarse bucket still removes the
    stale row from its old bucket, and a bucket emptied by such a move
    is removed from the live view in the same commit (RemovePartition —
    without it the old version directory would stay live and resurrect
    the moved row).  ``mode="append"``: the caller asserts every id is
    new; the locate scan is skipped entirely and cost is O(new data +
    touched buckets' current data) with no index-wide read.

    ``concurrency``: an extend is a read-modify-write, so the DEFAULT is
    ``"optimistic"`` — the commit pins the head read at entry
    (``expected_head``) and a racing commit conflicts
    (``CommitConflictError``; re-run to retry on the new base) instead
    of silently dropping rows.  The conflict SCOPE follows the read
    set: an UPSERT reads the whole index (its locate scan), so under
    ``"optimistic"`` it conflicts on ANY interim commit exactly like
    ``"strict"`` — a disjoint-bucket merge could otherwise leave a
    concurrently-landed copy of the same new id live in another bucket;
    an APPEND reads only its touched buckets, so disjoint-bucket racers
    auto-merge.  ``"strict"`` conflicts on any head movement in both
    modes; ``"last-writer-wins"`` restores the plain-write default for
    single-writer pipelines.  (Stronger defaults than
    ``versioned_insert_into``'s because a plain write only ADDS data —
    an RMW that loses the race rewrites buckets from a stale base.)

    MULTI-APPLICATION note: beyond commit-log safety, two SIMULTANEOUS
    Spark applications writing under one table location contend on the
    output committer's shared ``_temporary`` staging — a Spark-level
    clash the commit protocol cannot see (it fails jobs loudly, never
    silently).  Run ONE index maintainer per table (the stream sink);
    the optimistic pin turns an accidental second maintainer into a
    loud failure.  Where genuinely concurrent maintainers are needed on
    a HOST-LOCAL log, pass ``exclusive=True`` with a ``use_lock=True``
    tracker: the per-table flock is held across the WHOLE
    read-modify-write, serializing extends from separate OS processes —
    no staging clash, no conflicts, every batch lands (raced for real
    in tests/test_ann_index_multiprocess.py).

    Scale shape: one map-side encode pass over the NEW data; a driver
    collect of the touched bucket ids (≤ n_clusters ints); a
    read-modify-write of ONLY the touched buckets (the streaming sink's
    append pattern — partition values read as exact strings, never
    type-inferred); ONE commit carrying adds and removals atomically.
    When a batch spreads uniformly over ALL buckets the rewrite
    approaches a full rebuild — the honest LSM-style trade; the right
    cadence is batched extends punctuated by a periodic
    :func:`build_ann_index` refresh (which also re-fits drifted
    centroids).  Untouched buckets keep their version; vacuum reclaims
    superseded touched-bucket versions as usual."""
    if tuple(table.partition_schema.columns) != (BUCKET_COL,):
        raise ValueError(
            f"ANN index table must be partitioned by ({BUCKET_COL!r},), "
            f"got {table.partition_schema.columns}"
        )
    if mode not in ("upsert", "append"):
        raise ValueError(f"mode must be 'upsert' or 'append', got {mode!r}")
    if concurrency not in ("last-writer-wins", "optimistic", "strict"):
        raise ValueError(
            "concurrency must be 'last-writer-wins', 'optimistic' or "
            f"'strict', got {concurrency!r}"
        )
    if exclusive:
        if not (
            hasattr(tracker, "_commit_guard") and getattr(tracker, "_use_lock", False)
        ):
            raise ValueError(
                "exclusive=True needs a FileBackedVersionTracker with "
                "use_lock=True (the per-table flock is what serializes "
                "the whole read-modify-write across processes)"
            )
        # hold the table's commit flock for the ENTIRE extend; the inner
        # commit's guard is re-entrant within this thread, while other
        # processes' extends block until ours publishes — serial RMW, no
        # Spark output-committer staging clash, no conflicts to retry
        with tracker._commit_guard(tracker._table_dir(table.name)):
            return _extend_body(
                df_new, table, tracker, user_id, message, artifacts, mode,
                concurrency, id_col, vec_col, metastore,
            )
    return _extend_body(
        df_new, table, tracker, user_id, message, artifacts, mode,
        concurrency, id_col, vec_col, metastore,
    )


def _extend_body(
    df_new, table, tracker, user_id, message, artifacts, mode,
    concurrency, id_col, vec_col, metastore,
):
    spark = df_new.sparkSession
    # ONE log read feeds both the conflict pin and the RMW base: reading
    # them separately would let a commit land in between, making the base
    # newer than the pinned head — a spurious conflict on a write that
    # was actually derived from the current state.  The read must also be
    # SELF-CONSISTENT: the files tracker lists commit files before
    # reading head_ref, so a commit racing the read can yield a head
    # whose commit is missing from the listed updates — and
    # fold.take_through silently folds EVERYTHING when the head id is
    # absent, which would pin a head the folded base doesn't contain
    # (conflict check passes, base stale → lost update).  Re-read until
    # the pinned head's commit is present in the update list.
    from ..core import fold

    for _ in range(8):
        st = tracker.table_state(table.name)
        base_head = st.current_version
        if any(u.metadata.commit_id == base_head for u in st.updates):
            break
    else:
        raise RuntimeError(
            f"could not obtain a self-consistent log read for {table.name} "
            "after 8 attempts (head kept outrunning the commit listing)"
        )
    state = fold.current_version(st.updates, base_head)
    if artifacts is None:
        artifacts = load_ann_artifacts(table, state)
    centroids = artifacts.centroid_list
    codebooks = artifacts.codebook_list
    SIM.validate_ann_artifacts(df_new, vec_col, centroids, codebooks)

    vd = df_new.select(F.col(id_col), SIM.as_double(F.col(vec_col)).alias("v"))
    # persist the (bounded — one batch, never the index) encoded batch:
    # it is consumed up to four times below (bucket collect, duplicate
    # check, locate semi-join, RMW union+write) and re-running an
    # expensive upstream lineage per consumer would dominate the extend
    encoded_new = SIM.pq_encode(
        SIM._assign_nearest(vd, centroids).withColumnRenamed("cluster", BUCKET_COL),
        codebooks,
        id_col=id_col,
        vec_col="v",
        keep_cols=True,
    ).select(
        F.col(id_col),
        F.col(BUCKET_COL).cast("string").alias(BUCKET_COL),
        "pq_codes",
    ).persist()
    try:
        return _extend_publish(
            spark, table, tracker, state, base_head, encoded_new, artifacts,
            mode, concurrency, user_id, message, id_col, metastore,
        )
    finally:
        encoded_new.unpersist()


def _extend_publish(
    spark, table, tracker, state, base_head, encoded_new, artifacts,
    mode, concurrency, user_id, message, id_col, metastore,
):
    counts = encoded_new.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.col(id_col)).alias("nd"),
        F.count(F.when(F.col(id_col).isNull(), 1)).alias("nn"),
    ).collect()[0]
    if counts["nn"]:
        # countDistinct excludes NULLs, so without this check a null id
        # would be misreported as a duplicate; it would also never match
        # the upsert anti-join — reject it by name
        raise ValueError(
            f"df_new contains {counts['nn']} NULL {id_col} value(s) — "
            "every row needs a concrete id"
        )
    if counts["n"] != counts["nd"]:
        raise ValueError(
            f"df_new contains duplicate {id_col} values "
            f"({counts['n']} rows, {counts['nd']} distinct ids) — an upsert "
            "needs one row per id; deduplicate the batch first"
        )
    new_buckets = sorted(
        r[BUCKET_COL]
        for r in encoded_new.select(BUCKET_COL).distinct().collect()
    )
    if not new_buckets:
        raise ValueError("extend_ann_index got an empty batch")

    from ..spark.reader import read_version

    touched = set(new_buckets)
    new_ids = encoded_new.select(id_col).distinct()
    if mode == "upsert" and state.partition_versions:
        # locate old rows of re-submitted ids ANYWHERE in the index: a
        # column-pruned (id, bucket) scan filtered map-side against the
        # broadcast new-id set — the moved-bucket correctness pass
        old_locs = (
            read_version(spark, table, state, infer_partition_types=False)
            .select(F.col(id_col), F.col(BUCKET_COL))
            .join(F.broadcast(new_ids), id_col, "left_semi")
            .select(BUCKET_COL)
            .distinct()
            .collect()
        )
        touched |= {r[BUCKET_COL] for r in old_locs}
    touched_sorted = sorted(touched)

    sub_state = restrict_to_buckets(state, touched_sorted)
    out = encoded_new
    if sub_state.partition_versions:
        # current rows of exactly the touched buckets, partition values as
        # exact strings (read-modify-write contract); in upsert mode
        # same-id rows are superseded via a broadcast anti-join
        live = read_version(
            spark, table, sub_state, infer_partition_types=False
        ).select(F.col(id_col), F.col(BUCKET_COL), F.col("pq_codes"))
        if mode == "upsert":
            live = live.join(F.broadcast(new_ids), id_col, "left_anti")
        out = encoded_new.unionByName(live)

    # sidecar BEFORE the data commit (build's crash-ordering contract)
    version = generate_version()
    stamped = _write_artifact_sidecar(
        table, version.label, artifacts.centroids, artifacts.codebooks
    )

    # which touched buckets still hold rows — ONE small aggregation over
    # the touched slice (never an FS walk over every bucket directory of
    # the index; at n_clusters in the tens of thousands a per-batch walk
    # would dwarf the batch itself).  `out` is evaluated twice (this
    # count + the write), both passes bounded by the touched slice.
    from ..core.model import Partition

    written_buckets = {
        r[BUCKET_COL]
        for r in out.select(BUCKET_COL).distinct().collect()
    }
    written_parts = [
        Partition.of((BUCKET_COL, b)) for b in sorted(written_buckets)
    ]
    had_live = {
        dict(p.column_values)[BUCKET_COL]
        for p in sub_state.partition_versions
    }
    emptied = [
        Partition.of((BUCKET_COL, b))
        for b in touched_sorted
        if b in had_live and b not in written_buckets
    ]

    from ..spark.writer import versioned_insert_into

    # the SAME commit carries the Add ops for written buckets and the
    # Remove ops for buckets a moved upsert emptied.  Conflict scope:
    # an UPSERT's read set is the whole index (the locate scan), so
    # "optimistic" pins the head strictly — ANY interim commit could
    # e.g. have landed the same new id in another bucket, and a
    # disjoint-merge would leave that id live twice; an APPEND only
    # reads the touched buckets, so disjoint-bucket racers auto-merge.
    eff = concurrency
    if concurrency == "optimistic" and mode == "upsert":
        eff = "strict"
    new_state, _ = versioned_insert_into(
        out, table, tracker, user_id, message,
        version=version, metastore=metastore,
        partitions=written_parts,
        concurrency=eff, base_head=base_head,
        remove_partitions=emptied,
    )
    return new_state, stamped


def commit_ann_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "ann",
    artifacts: "AnnArtifacts | None" = None,
    message_prefix: str = "ann-stream",
    mode: str = "upsert",
    epoch_cache: "dict | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
) -> None:
    """Land ONE embedding micro-batch as an index extend (the
    ``foreachBatch`` body of :func:`ann_stream_sink`, exposed for direct
    use/testing).  Same epoch-replay contract as the streaming ingest
    sink (:mod:`chronicles_spark.streaming.ingest`): an epoch EQUAL to
    the latest committed one is a crash-replay and is skipped; an epoch
    BEHIND it (wiped checkpoint reusing ids under the same
    ``message_prefix``) raises.  ``epoch_cache`` amortizes the guard's
    log read to once per (re)start.  A concurrent index writer surfaces
    as :class:`~chronicles_spark.trackers.base.CommitConflictError`
    (extend's optimistic default) and fails the stream loudly — two
    writers maintaining one index is a deployment error, not a race to
    arbitrate silently."""
    from ..streaming.ingest import epoch_replay_guard

    if batch_df.isEmpty():
        return
    message = f"{message_prefix} epoch {epoch_id}"
    if epoch_replay_guard(
        tracker, table.name, message_prefix, epoch_id, epoch_cache
    ):
        return  # checkpoint replay of the just-committed epoch
    try:
        extend_ann_index(
            batch_df, table, tracker, user_id, message,
            artifacts=artifacts, mode=mode,
            id_col=id_col, vec_col=vec_col, metastore=metastore,
        )
        if epoch_cache is not None:
            epoch_cache["latest_epoch"] = epoch_id
    except BaseException:
        # same stale-cache hazard as the ingest sink: re-derive from the
        # log on the next attempt rather than trusting a cached epoch
        if epoch_cache is not None:
            epoch_cache.pop("latest_epoch", None)
        raise


def ann_stream_sink(
    stream_df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    checkpoint_dir: str,
    artifacts: "AnnArtifacts | None" = None,
    message_prefix: str = "ann-stream",
    mode: str = "upsert",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
):
    """Streaming maintenance of a materialized ANN index: every embedding
    micro-batch becomes one :func:`extend_ann_index` commit — the
    versioned-ingest sink's shape, composed with the index family.
    Caller starts it (and picks the trigger)::

        q = ann_stream_sink(emb_stream, index, tracker, "ml",
                            "/ckpt/index").trigger(availableNow=True).start()

    Pass ``artifacts=`` (the build's output) to skip the per-batch
    sidecar resolution; with the default every batch re-resolves from
    the live state, which also picks up an out-of-band full rebuild
    mid-stream (the next batch encodes under the NEW quantizer).
    Replayed epochs are skipped (batch-level exactly-once, keyed on
    ``message_prefix`` like the ingest sink — one sink per prefix)."""
    epoch_cache: dict = {}

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        commit_ann_stream_batch(
            batch_df, epoch_id, table, tracker, user_id,
            artifacts=artifacts, message_prefix=message_prefix, mode=mode,
            epoch_cache=epoch_cache, id_col=id_col, vec_col=vec_col,
            metastore=metastore,
        )

    return stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def vacuum_ann_artifacts(
    table: TableDefinition,
    tracker: VersionTracker,
    dry_run: bool = False,
    orphan_min_age=None,
) -> list:
    """Reclaim artifact sidecars whose index version's DATA is gone —
    the companion sweep to :func:`~chronicles_spark.spark.vacuum.vacuum`
    (which reclaims the version directories but knows nothing about this
    module's sidecars).  Returns the removed (dry-run: doomed) paths.

    A sidecar is doomed when every version directory the commit log
    recorded for its label has already been deleted — pure storage
    truth, so this can never outrun vacuum's retention policy (tags,
    keep_last windows, branch pins all resolve to data directories that
    still exist).  Like :func:`~chronicles_spark.spark.vacuum.vacuum`,
    the sweep enumerates EVERY line of history over this storage
    location (the table plus all its branches) when mapping labels to
    directories — a label committed only on a branch must never be
    misread as a commit-less orphan — and refuses to run against a
    branch name (a branch shares its source's storage).  A sidecar whose
    label NO line's log recorded (a build that crashed between sidecar
    write and commit) is doomed only once older than ``orphan_min_age``
    (default 7 days — vacuum's orphan retention), and kept when the
    backend cannot report an mtime.  Cost: one root listing +
    O(#doomed-candidate labels × their partition count) existence
    probes — metadata-scale."""
    from datetime import timedelta
    import time as _time

    from ..branching import branches, parse_branch
    from ..core import paths as vpaths
    from ..core.ops import AddPartitionVersion

    if parse_branch(table.name) is not None:
        raise ValueError(
            f"{table.name} is a branch; sweep its source table's sidecars "
            "(branch-committed labels are protected automatically)"
        )
    if orphan_min_age is None:
        orphan_min_age = timedelta(days=7)
    fs, root = filesystem_for(table.location)
    sidecars = [
        n
        for n in fs.list_dir(root)
        if n.startswith(ARTIFACT_PREFIX) and n.endswith(".json")
    ]
    labels = {n[len(ARTIFACT_PREFIX):-len(".json")] for n in sidecars}
    dirs_by_label: dict = {}
    lines = [table.name, *branches(tracker, table.name).values()]
    for line in lines:
        for u in tracker.table_state(line).updates:
            for op in u.operations:
                if (
                    isinstance(op, AddPartitionVersion)
                    and op.version.label in labels
                ):
                    dirs_by_label.setdefault(op.version.label, set()).add(
                        vpaths.path_for(
                            op.partition.resolve_path(root), op.version
                        )
                    )
    doomed = []
    now = _time.time()
    for n in sorted(sidecars):
        label = n[len(ARTIFACT_PREFIX):-len(".json")]
        path = fs.join(root, n)
        dirs = dirs_by_label.get(label, set())
        if dirs:
            if not any(fs.is_dir(d) for d in dirs):
                doomed.append(path)
            continue
        mt = fs.mtime(path)
        if mt is not None and now - mt > orphan_min_age.total_seconds():
            doomed.append(path)
    if not dry_run:
        for p in doomed:
            fs.remove_file(p)
    return doomed


def search_ann_index(
    spark: SparkSession,
    table: TableDefinition,
    tracker: VersionTracker,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    shortlist_k: int = 100,
    n_probe: int = 2,
    metric: str = "cosine",
    artifacts: "AnnArtifacts | None" = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full IVFPQ+refine recipe in one call: scan-pruned approximate
    search over the materialized index (``shortlist_k`` candidates per
    query — the recall knob), then exact re-ranking of the shortlist
    against ``vectors`` (the original full-precision embedding table)
    down to the final ``k``.  Returns
    :func:`~chronicles_spark.operators.similarity.rerank_topk`'s shape:
    (query_id, rank, neighbor_id, cosine|l2_dist).

    The corpus-scale cost profile composes from its parts: the index
    read touches only probed buckets; the exact pass touches only
    Q·shortlist_k original vectors (broadcast shortlist into one
    map-side pass over ``vectors``)."""
    if shortlist_k < k:
        raise ValueError(
            f"shortlist_k ({shortlist_k}) must be >= k ({k}) — it is the "
            "recall knob over the final exact top-k"
        )
    shortlist = ivfpq_topk_indexed(
        spark, table, tracker, queries, k=shortlist_k, n_probe=n_probe,
        artifacts=artifacts, query_id_col=query_id_col,
        query_vec_col=query_vec_col, id_col=id_col,
    )
    return SIM.rerank_topk(
        shortlist, vectors, queries, k=k, metric=metric,
        id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    )


def restrict_to_buckets(table_version, buckets) -> PartitionedTableVersion:
    """The sub-state holding ONLY the given buckets' live partitions —
    the partition-pruning step: feeding this to the versioned reader
    builds a path list that never mentions an unprobed bucket.  Bucket
    values compare as strings (partition values are strings at the
    metadata layer)."""
    wanted = {str(b) for b in buckets}
    kept = {
        p: v
        for p, v in table_version.partition_versions.items()
        if dict(p.column_values).get(BUCKET_COL) in wanted
    }
    return PartitionedTableVersion(kept)


def probed_bucket_paths(
    table: TableDefinition, table_version, buckets
) -> list:
    """Concrete live directories for exactly the probed buckets (audit /
    test surface for the scan-pruning claim)."""
    from ..spark.reader import live_paths

    return live_paths(table, restrict_to_buckets(table_version, buckets))


def ivfpq_topk_indexed(
    spark: SparkSession,
    table: TableDefinition,
    tracker: VersionTracker,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    artifacts: "AnnArtifacts | None" = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    id_type: str = "long",
) -> DataFrame:
    """IVF+PQ search against a MATERIALIZED index, pruning at the scan.

    1. resolve the current index state and its pinned artifacts (or take
       ``artifacts=`` for a caller-cached / mixed-version index);
    2. probe selection — each query's ``n_probe`` nearest coarse buckets
       (:func:`~chronicles_spark.operators.similarity.select_probes`,
       tiny centroid broadcast);
    3. collect the DISTINCT probed bucket ids (metadata-scale: at most
       n_clusters ints, independent of Q — the same driver-side
       cardinality class as the reader's live-path resolution) and read
       ONLY those buckets' live directories through the versioned
       reader's path selection — unprobed buckets are never listed or
       opened, which is the scan-level pruning the in-memory
       :func:`~chronicles_spark.operators.similarity.ivfpq_topk` cannot
       do (its docstring's shuffle caveat);
    4. asymmetric-distance scoring of the pruned slice
       (:func:`~chronicles_spark.operators.similarity.adc_over_probes`).

    Returns (query_id, rank, neighbor_id, adc_dist), ranks 1..k by
    ascending approximate squared L2, id tie-break — byte-identical to
    ``ivfpq_topk`` under the same artifacts (pinned in the driver gate).
    Exact refinement: feed the result to
    :func:`~chronicles_spark.operators.similarity.rerank_topk` with a
    ``shortlist_k > k`` search.

    Probe-selection cost note: the probe relation is evaluated twice
    (once to collect the distinct bucket ids, once in the ADC join).
    Stage 1 is a map-side pass over the QUERY set against a k·dim
    broadcast — for the corpus-scale-Q regime cache ``queries`` first;
    the corpus side is read exactly once either way."""
    state = tracker.current_version(table.name)
    if artifacts is None:
        artifacts = load_ann_artifacts(table, state)
    centroids = artifacts.centroid_list
    codebooks = artifacts.codebook_list

    probes = SIM.select_probes(
        queries, centroids, n_probe, query_id_col, query_vec_col
    )
    probed = sorted(
        r[BUCKET_COL] for r in probes.select(BUCKET_COL).distinct().collect()
    )

    from ..spark.reader import read_version

    sub_state = restrict_to_buckets(state, probed)
    if not sub_state.partition_versions:
        # Legitimate states, both yielding an EMPTY result (the in-memory
        # ivfpq_topk contract): no queries at all, or every probed bucket
        # is a memberless k-means cluster (kmeans_fit keeps empty
        # clusters' centroids; the build writes no partition for them).
        # The schema must match the non-empty path exactly — derive it by
        # running the normal pipeline over a zero-row slice of ANY live
        # partition instead of hardcoding column types.
        live = list(
            state.partition_versions.items()
            if isinstance(state, PartitionedTableVersion)
            else []
        )
        if not live:
            # initialized-but-empty index (artifacts passed explicitly,
            # no build yet): a no-op query must stay a no-op.  With no
            # data to derive the corpus id type from, neighbor_id takes
            # ``id_type`` (default long — pass the corpus id's Spark
            # type name when it differs so pre-build and post-build
            # schemas line up); the query-id type comes from the probes.
            qt = probes.schema[query_id_col].dataType.simpleString()
            return spark.createDataFrame(
                [],
                f"{query_id_col} {qt}, rank int, neighbor_id {id_type}, "
                "adc_dist double",
            )
        sub_state = PartitionedTableVersion(dict(live[:1]))
        codes = read_version(spark, table, sub_state).limit(0)
    else:
        codes = read_version(spark, table, sub_state)
    corpus = codes.select(
        F.col(id_col),
        F.col(BUCKET_COL).cast("int").alias(BUCKET_COL),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    return SIM.adc_over_probes(
        corpus, probes, codebooks, k, id_col, query_id_col
    )
