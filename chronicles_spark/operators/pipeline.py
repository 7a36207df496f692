"""End-to-end corpus curation: the composition a training-data pipeline
actually runs.

``curate_corpus`` = quality filter ∘ near-dup removal: score every
document (pure JVM exprs), find near-duplicate clusters (MinHash+LSH →
Jaccard verify → connected components), and keep documents that clear the
quality bar AND are either unique or their cluster's canonical survivor.

Plan shape at 100 TB: the corpus is scanned once for scoring and once for
shingling (both map-side); the cluster frame is near-dup-pair-sized (tiny
relative to the corpus) and joins back broadcast-style.  Every stage is
the already-audited operator — this module only composes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup as DD
from . import text as TX


def curate_corpus(
    docs: DataFrame,
    quality_threshold: float = 0.3,
    bands: int = 8,
    rows: int = 2,
    jaccard_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Surviving documents: ``(doc_id, n_tokens, quality_score)`` for docs
    with ``quality_score >= quality_threshold`` that are not a non-canonical
    member of a near-dup cluster (cluster survivor = min doc id)."""
    scored = TX.with_quality_score(docs.select(id_col, text_col)).drop(text_col)
    pairs = DD.minhash_dedup(
        docs.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        bands=bands,
        rows=rows,
        threshold=jaccard_threshold,
    )
    clusters = DD.dedup_clusters(pairs, id_col=id_col)
    # no broadcast hint: the cluster frame is duplicate-count-sized, which a
    # high-dup-rate 100 TB corpus can push past broadcast limits — AQE
    # broadcasts it at runtime when it IS small
    joined = scored.join(clusters.select(id_col, "keep"), id_col, "left")
    return joined.where(
        (F.col("quality_score") >= quality_threshold)
        & F.coalesce(F.col("keep"), F.lit(True))
    ).select(id_col, "n_tokens", "quality_score")
