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
    artifacts = AnnArtifacts(
        centroids=tuple((cid, tuple(c)) for cid, c in centroids),
        codebooks=tuple(tuple(tuple(c) for c in cb) for cb in codebooks),
        version_label=version.label,
    )
    fs, apath = _artifact_path(table, version.label)
    fs.mkdirs(fs.join(*apath.rsplit("/", 1)[:1]))  # first build: no table dir yet
    fs.write_text(apath, artifacts.to_json())
    state, _ = versioned_insert_into(
        encoded, table, tracker, user_id, message,
        version=version, metastore=metastore,
    )
    return state, artifacts


def load_ann_artifacts(
    table: TableDefinition, table_version
) -> AnnArtifacts:
    """Artifacts pinned by a resolved index state.  Requires every live
    partition at ONE version label (the atomic-full-rebuild contract this
    module's builder maintains); a mixed-version state means the table
    was written outside :func:`build_ann_index` — pass its artifacts to
    :func:`ivfpq_topk_indexed` explicitly instead."""
    if not isinstance(table_version, PartitionedTableVersion):
        raise ValueError("ANN index tables are partitioned by bucket")
    labels = {v.label for v in table_version.partition_versions.values()}
    if not labels:
        raise ValueError(f"table {table.name} has no live index data")
    if len(labels) != 1:
        raise ValueError(
            f"table {table.name} has live partitions at {len(labels)} "
            "different versions — not an atomically-built ANN index; pass "
            "artifacts= explicitly"
        )
    fs, apath = _artifact_path(table, labels.pop())
    if not fs.exists(apath):
        raise ValueError(
            f"no artifact sidecar for the live index version at {apath}"
        )
    return AnnArtifacts.from_json(fs.read_text(apath))


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
    if not probed:
        # no queries → empty result with the right schema
        return spark.createDataFrame(
            [],
            f"{query_id_col} long, rank int, neighbor_id long, adc_dist double",
        )

    from ..spark.reader import read_version

    sub_state = restrict_to_buckets(state, probed)
    if not sub_state.partition_versions:
        raise ValueError(
            f"probed buckets {probed} have no live partitions in "
            f"{table.name} — index artifacts and data have diverged"
        )
    codes = read_version(spark, table, sub_state)
    corpus = codes.select(
        F.col(id_col),
        F.col(BUCKET_COL).cast("int").alias(BUCKET_COL),
        F.posexplode("pq_codes").alias("sub", "code"),
    )
    return SIM.adc_over_probes(
        corpus, probes, codebooks, k, id_col, query_id_col
    )
