"""Incremental EMBEDDING dedup: the sign-LSH state materialized on the
versioned lake, so near-dup-checking a new embedding batch against a
100 TB corpus is O(batch), not O(corpus).

:func:`~chronicles_spark.operators.dedup.embedding_lsh_dedup` recomputes
sign bits, band buckets, and exact cosines over the WHOLE corpus per
run — the exact gap :mod:`~chronicles_spark.operators.dedup_index`
closed for text MinHash in round 8.  This module is the embedding
instance of that family-generic core:

* the **band table** persists ``(vec_id, band_id, band_key)`` where
  ``band_key`` is the band's concatenated hyperplane sign bits
  (:func:`~chronicles_spark.operators.dedup.sign_lsh_banded` — the same
  deterministic md5-derived hyperplanes as the one-shot operator, so a
  DuckDB oracle reproduces the keys bit-for-bit), sharded and sorted
  exactly like the text band table;
* the **doc table** (``<name>_docs``) persists ``(vec_id, embedding)``
  — the exact-cosine verify source, sharded by id, files sorted by id;
* the optional **pairs table** journals each extend's verified
  ``(id_a, id_b, cosine)`` pairs exactly-once in the same pair commit.

Everything structural — shard pruning, band-key row-group pushdown,
upsert/append semantics, the RMW pair-commit publish, torn-pair
refusal, re-geometry rebuild, streaming maintenance, sidecar GC — is
the shared core in :mod:`~chronicles_spark.operators.dedup_index`; this
module contributes only the encoder (identity over the vector column),
the bander (sign-LSH), the verifier (exact cosine), and the geometry
sidecar (``dim``/``n_planes`` in place of ``width``/``rows``).

A replaced id's old vector re-derives its old band rows from the doc
store (sign bits are a pure function of the stored vector), so upserts
remove stale buckets without any corpus scan — the same argument as
text.  Recall matches :func:`embedding_lsh_dedup`'s documented LSH
trade-off: pairs at or above the cosine threshold that never collide
in any band are missed; tune ``(n_planes, bands)``.

No reference counterpart: stettix/chronicles versions tables
(core/.../VersionTracker.scala); this composes the repo's commit
protocol with its LLM-pipeline operators.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.model import PartitionedTableVersion, TableDefinition
from ..core.version import generate_version
from ..trackers.base import VersionTracker
from . import dedup as DD
from .dedup_index import (
    DRIFT_MAX_BAND_SHARD_ROWS,
    _build_index,
    _commit_index_stream_batch,
    _extend_index,
    _IndexFamily,
    _load_artifacts,
    _rebuild_index,
    _require_band_partitioning,
    _verify_index,
    dedup_docs_table,
    dedup_pairs_table,
)
from .pairing import check_pair, pinned_state

_EMB_REPAIR_ADVICE = (
    "rebuild with build_embedding_dedup_index over the full corpus (or "
    "checkout both tables to a matching pair) before extending"
)


@dataclass(frozen=True)
class EmbeddingDedupArtifacts:
    """The geometry an embedding dedup index version pins (the
    :class:`~chronicles_spark.operators.dedup_index.DedupArtifacts`
    contract: sidecar per data version label, all live labels must
    agree).  ``dim`` and ``n_planes`` define the hyperplanes; ``bands``
    slices the n_planes sign bits into band keys."""

    n_planes: int
    bands: int
    dim: int
    band_shards: int
    doc_shards: int
    version_label: str

    def geometry(self) -> dict:
        d = self.__dict__.copy()
        d.pop("version_label")
        return d

    def with_label(self, label: str) -> "EmbeddingDedupArtifacts":
        return replace(self, version_label=label)

    def to_json(self) -> str:
        return json.dumps({"version_label": self.version_label, **self.geometry()})

    @staticmethod
    def from_json(text: str) -> "EmbeddingDedupArtifacts":
        d = json.loads(text)
        return EmbeddingDedupArtifacts(
            n_planes=int(d["n_planes"]),
            bands=int(d["bands"]),
            dim=int(d["dim"]),
            band_shards=int(d["band_shards"]),
            doc_shards=int(d["doc_shards"]),
            version_label=d["version_label"],
        )


def load_embedding_dedup_artifacts(
    table: TableDefinition, table_version
) -> EmbeddingDedupArtifacts:
    return _load_artifacts(
        table, table_version, EmbeddingDedupArtifacts.from_json,
        "embedding dedup",
    )


def _emb_family(
    artifacts: EmbeddingDedupArtifacts, id_col: str, vec_col: str,
    threshold: "float | None",
):
    return _IndexFamily(
        kind="embedding_dedup",
        payload_col=vec_col,
        band_fn=lambda payload: DD.sign_lsh_banded(
            payload, artifacts.dim, id_col, vec_col,
            artifacts.n_planes, artifacts.bands,
        ),
        verify_fn=lambda payload, cand: DD.cosine_verify(
            payload, cand, id_col, vec_col, threshold
        ),
        repair_advice=_EMB_REPAIR_ADVICE,
    )


def _check_dim(df, vec_col: str, dim: int) -> None:
    """Milliseconds vs silently-wrong sign bits: a mismatched dim would
    NULL-poison the hyperplane dot products (zip_with pads the shorter
    array) — the semantic_dedup guard applied here."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if row and row[0]["d"] != dim:
        raise ValueError(
            f"dim={dim} does not match the embedding dimension "
            f"{row[0]['d']} observed in {vec_col!r}"
        )


def build_embedding_dedup_index(
    df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    dim: int,
    user_id: str = "dedup",
    message: str = "build embedding dedup index",
    n_planes: int = 16,
    bands: int = 4,
    band_shards: int = 32,
    doc_shards: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
):
    """Band the corpus' embeddings ONCE and publish the sign-LSH state
    as a versioned band table + vector store, both in one pair commit —
    the embedding twin of
    :func:`~chronicles_spark.operators.dedup_index.build_dedup_index`
    (same table shapes, same commit protocol, same O(batch) extends
    afterwards).  Returns ``(band_table_state,
    EmbeddingDedupArtifacts)``.  The build produces no pairs — dedup of
    the base corpus is :func:`embedding_lsh_dedup`'s job (same
    hyperplanes, so build-then-extend agrees with it exactly)."""
    _require_band_partitioning(table, "embedding dedup")
    for n, v in (("n_planes", n_planes), ("bands", bands), ("dim", dim),
                 ("band_shards", band_shards), ("doc_shards", doc_shards)):
        if v < 1:
            raise ValueError(f"{n} must be >= 1, got {v}")
    if n_planes % bands:
        raise ValueError(
            f"bands={bands} must divide n_planes={n_planes} evenly"
        )
    _check_dim(df, vec_col, dim)
    version = generate_version()
    artifacts = EmbeddingDedupArtifacts(
        n_planes=n_planes, bands=bands, dim=dim, band_shards=band_shards,
        doc_shards=doc_shards, version_label=version.label,
    )
    family = _emb_family(artifacts, id_col, vec_col, threshold=None)
    encoded = df.select(F.col(id_col), F.col(vec_col))
    return _build_index(
        encoded, table, tracker, family, artifacts, version,
        user_id, message, id_col, metastore,
    )


def extend_embedding_dedup_index(
    df_new: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "dedup",
    message: str = "extend embedding dedup index",
    threshold: float = 0.95,
    mode: str = "upsert",
    concurrency: str = "optimistic",
    artifacts: "EmbeddingDedupArtifacts | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
    pairs_table: "TableDefinition | None" = None,
    exclusive: bool = False,
    drift_shard_rows: "int | None" = DRIFT_MAX_BAND_SHARD_ROWS,
):
    """Near-dup-check ONE new embedding batch against the indexed
    corpus — and fold the batch in — in O(batch), independent of corpus
    size.  Returns ``(verified_pairs, band_table_state, artifacts)``
    where ``verified_pairs`` is ``(id_a, id_b, cosine)`` for every pair
    at or above ``threshold`` with at least one endpoint in the batch,
    id_a < id_b — exactly the rows a full :func:`embedding_lsh_dedup`
    re-run over corpus+batch would add for these vectors.  Semantics,
    cost shape, upsert/append/pairs/concurrency/``exclusive`` contracts
    are the text family's (:func:`~chronicles_spark.operators.
    dedup_index.extend_dedup_index`) — one shared core, different
    encoder/verifier."""
    from .dedup_index import _run_maybe_exclusive

    _require_band_partitioning(table, "embedding dedup")
    if mode not in ("upsert", "append"):
        raise ValueError(f"mode must be 'upsert' or 'append', got {mode!r}")
    if concurrency not in ("last-writer-wins", "optimistic", "strict"):
        raise ValueError(
            "concurrency must be 'last-writer-wins', 'optimistic' or "
            f"'strict', got {concurrency!r}"
        )

    def _run():
        docs_table = dedup_docs_table(table)
        state, base_head, head_pair = pinned_state(tracker, table.name)
        docs_state, docs_head, docs_pair = pinned_state(
            tracker, docs_table.name
        )
        check_pair(table, head_pair, docs_pair, _EMB_REPAIR_ADVICE)
        if not isinstance(state, PartitionedTableVersion) or not isinstance(
            docs_state, PartitionedTableVersion
        ):
            raise ValueError("dedup index tables are partitioned by shard")
        arts = artifacts
        if arts is None:
            arts = load_embedding_dedup_artifacts(table, state)
        _check_dim(df_new, vec_col, arts.dim)
        family = _emb_family(arts, id_col, vec_col, threshold)
        base_new = df_new.select(F.col(id_col), F.col(vec_col)).persist()
        try:
            return _extend_index(
                table, docs_table, tracker, family, state, docs_state,
                base_head, docs_head, head_pair, base_new, arts, mode,
                concurrency, user_id, message, id_col, metastore,
                pairs_table, drift_shard_rows,
            )
        finally:
            base_new.unpersist()

    return _run_maybe_exclusive(tracker, table, exclusive, _run)


def verify_embedding_dedup_index(
    spark: SparkSession,
    table: TableDefinition,
    tracker: VersionTracker,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Differential audit: re-derives every vector's band rows from the
    stored embeddings and returns disagreements with the band table
    (empty = consistent) — the embedding twin of
    :func:`~chronicles_spark.operators.dedup_index.verify_dedup_index`."""
    state = tracker.current_version(table.name)
    artifacts = load_embedding_dedup_artifacts(table, state)
    family = _emb_family(artifacts, id_col, vec_col, threshold=None)
    return _verify_index(spark, table, tracker, family, state, id_col)


def rebuild_embedding_dedup_index(
    spark: SparkSession,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "dedup",
    message: str = "rebuild embedding dedup index",
    n_planes: "int | None" = None,
    bands: "int | None" = None,
    band_shards: "int | None" = None,
    doc_shards: "int | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs_table: "TableDefinition | None" = None,
    metastore=None,
):
    """Re-geometry in place from ONE doc-store pass (the stored vectors
    re-derive everything; only ``dim`` — a property of the data — is
    immutable).  Same strict pair-commit semantics and sizing rule as
    :func:`~chronicles_spark.operators.dedup_index.rebuild_dedup_index`."""
    _require_band_partitioning(table, "embedding dedup")
    state, _, _ = pinned_state(tracker, table.name)
    old = load_embedding_dedup_artifacts(table, state)
    new_geo = dict(
        n_planes=n_planes if n_planes is not None else old.n_planes,
        bands=bands if bands is not None else old.bands,
        dim=old.dim,
        band_shards=band_shards if band_shards is not None else old.band_shards,
        doc_shards=doc_shards if doc_shards is not None else old.doc_shards,
    )
    for n, v in new_geo.items():
        if v < 1:
            raise ValueError(f"{n} must be >= 1, got {v}")
    if new_geo["n_planes"] % new_geo["bands"]:
        raise ValueError(
            f"bands={new_geo['bands']} must divide "
            f"n_planes={new_geo['n_planes']} evenly"
        )
    version = generate_version()
    artifacts = EmbeddingDedupArtifacts(version_label=version.label, **new_geo)
    family = _emb_family(artifacts, id_col, vec_col, threshold=None)
    return _rebuild_index(
        spark, table, tracker, family, artifacts, version,
        user_id, message, id_col, pairs_table, metastore,
    )


def commit_embedding_dedup_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str = "dedup",
    artifacts: "EmbeddingDedupArtifacts | None" = None,
    message_prefix: str = "emb-dedup-stream",
    threshold: float = 0.95,
    mode: str = "upsert",
    epoch_cache: "dict | None" = None,
    on_pairs=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
    pairs_table: "TableDefinition | None" = None,
) -> None:
    """Land ONE embedding micro-batch as an index extend — the
    ``foreachBatch`` body of :func:`embedding_dedup_stream_sink`; same
    epoch-replay and exactly-once-pairs contracts as the text family's
    :func:`~chronicles_spark.operators.dedup_index.
    commit_dedup_stream_batch`."""

    def extend_fn(df, message):
        return extend_embedding_dedup_index(
            df, table, tracker, user_id, message,
            threshold=threshold, mode=mode, artifacts=artifacts,
            id_col=id_col, vec_col=vec_col, metastore=metastore,
            pairs_table=pairs_table,
        )

    _commit_index_stream_batch(
        batch_df, epoch_id, table, tracker, extend_fn,
        message_prefix, epoch_cache, on_pairs,
    )


def embedding_dedup_stream_sink(
    stream_df: DataFrame,
    table: TableDefinition,
    tracker: VersionTracker,
    user_id: str,
    checkpoint_dir: str,
    artifacts: "EmbeddingDedupArtifacts | None" = None,
    message_prefix: str = "emb-dedup-stream",
    threshold: float = 0.95,
    mode: str = "upsert",
    on_pairs=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metastore=None,
    pairs_table: "TableDefinition | None" = None,
):
    """Streaming maintenance of the embedding dedup index: every
    micro-batch becomes one O(batch) extend commit — the daily-delta
    shape for embedding pipelines (each batch near-dup-checked against
    everything ever embedded, then folded in)."""
    epoch_cache: dict = {}

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        commit_embedding_dedup_stream_batch(
            batch_df, epoch_id, table, tracker, user_id,
            artifacts=artifacts, message_prefix=message_prefix,
            threshold=threshold, mode=mode, epoch_cache=epoch_cache,
            on_pairs=on_pairs, id_col=id_col, vec_col=vec_col,
            metastore=metastore, pairs_table=pairs_table,
        )

    return stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
