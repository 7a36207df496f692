"""Multimodal (binary-column) operators: opaque media bytes + typed metadata.

Design for a 100 TB lake: image/audio/video assets live as an opaque
``binary`` column plus typed metadata columns, exactly like any other
column — versioned writes, partition pruning and column projection all
work unchanged, and a scan that only needs metadata never deserializes
the payload bytes (parquet column pruning drops ``content``).

Three layers, in order of cost:

1. **Metadata extraction** — pure JVM column expressions
   (``octet_length`` / ``sha2`` / ``hex(substring(...))``): single narrow
   projection, whole-stage codegen, zero Python.
2. **Fingerprint dedup** — exact binary dedup via content hash; one
   hash-partitioned aggregation, skew-free 256-bit keys.
3. **Decode / feature extraction** — Arrow-batched ``mapInPandas``.  The
   actual image codec is NOT available in this environment, so the decode
   kernel is a clearly-marked deterministic fake (`_fake_decode_meta`);
   everything around it — output schema, batch iteration, vectorized
   per-batch compute, partition-preserving plan shape — is the real
   production plumbing.  Swapping the fake for PIL/ffmpeg is a one-function
   change on the executors.

The reference (stettix/chronicles) has no multimodal surface; this module
is part of the training-data-pipeline extension requested by the build
brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def as_binary_assets(
    df: DataFrame, source_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Project a source column into the multimodal asset schema:
    ``(asset_id, content: binary, media_type)``.

    In production the binary column arrives from ingest (image/audio
    bytes); here the testdata's text bytes stand in, which keeps every
    downstream operator byte-exact and oracle-checkable."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.to_binary(F.col(source_col), F.lit("utf-8")).alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def with_binary_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata over the opaque payload — byte length, sha256 content
    address, and the leading magic bytes (what a format sniffer reads).
    Pure JVM exprs; parquet scans that only need these columns still read
    the payload column, so in a real pipeline these are computed once at
    ingest and stored alongside the bytes."""
    c = F.col(content_col)
    return df.select(
        "*",
        F.octet_length(c).alias("byte_len"),
        F.sha2(c, 256).alias("content_sha256"),
        F.upper(F.hex(F.substring(c, 1, 4))).alias("magic_bytes"),
    )


def binary_fingerprint(content_col: str = "content", prefix_bytes: int | None = None):
    """64-bit content fingerprint (hex) for grouping/dedup.

    Stands in for a perceptual hash: on decoded media a pHash replaces
    this expression (same column contract — 16 hex chars), computed in the
    decode `mapInPandas` pass. For the opaque-bytes baseline it is the
    sha256 prefix, which is exact-dup-complete and skew-free.

    ``prefix_bytes`` hashes only the leading chunk — the standard trick for
    container formats whose header region determines identity (and it lets
    the fingerprint be computed from a ranged read at 100 TB)."""
    c = F.col(content_col)
    if prefix_bytes is not None:
        c = F.substring(c, 1, prefix_bytes)
    return F.substring(F.sha2(c, 256), 1, 16)


def dedup_binary_exact(
    df: DataFrame, id_col: str = "asset_id", prefix_bytes: int | None = None
) -> DataFrame:
    """Exact duplicate groups by content fingerprint: one hash aggregation
    (partial aggregates map-side), returns groups with >1 asset —
    ``(fingerprint, n_assets, keep_id)`` where keep_id is the smallest id
    (the canonical survivor)."""
    return (
        df.select(
            F.col(id_col),
            binary_fingerprint(prefix_bytes=prefix_bytes).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_assets") > 1)
    )


# ---------------------------------------------------------------------------
# Decode / feature extraction — Arrow-batched mapInPandas.

DECODED_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_pixel_bytes", LongType()),
        StructField("codec", StringType()),
    ]
)


def _fake_decode_meta(lengths: pd.Series) -> pd.DataFrame:
    """DETERMINISTIC FAKE image decode (the real codec — PIL/libjpeg — is
    not installed in this environment).  Derives plausible dimensions from
    the payload length only, so the result is reproducible anywhere,
    including in a SQL oracle.  Production passes ``decoder="pil"`` to
    :func:`decode_image_meta` (same Arrow plumbing, real bytes — smoke-
    tested wherever PIL exists via ``CHRONICLES_PIL_SMOKE=1``)."""
    width = (16 + lengths % 16).astype("int32")
    height = (16 + (lengths // 7) % 16).astype("int32")
    channels = pd.Series(3, index=lengths.index, dtype="int32")
    return pd.DataFrame(
        {
            "width": width,
            "height": height,
            "n_channels": channels,
            "n_pixel_bytes": (width.astype("int64") * height * channels),
            "codec": "fake",
        }
    )


def _pil_decode_meta(contents: pd.Series) -> pd.DataFrame:
    """REAL image decode over raw payload bytes via PIL — imported inside
    the function so it resolves on the EXECUTOR's interpreter (Spark
    workers are separate Python processes).  Same output columns as the
    fake; only this one function differs between environments."""
    import io

    from PIL import Image

    widths, heights, channels, codecs = [], [], [], []
    for b in contents:
        with Image.open(io.BytesIO(bytes(b))) as img:
            widths.append(img.width)
            heights.append(img.height)
            channels.append(len(img.getbands()))
            codecs.append((img.format or "unknown").lower())
    width = pd.Series(widths, index=contents.index, dtype="int32")
    height = pd.Series(heights, index=contents.index, dtype="int32")
    ch = pd.Series(channels, index=contents.index, dtype="int32")
    return pd.DataFrame(
        {
            "width": width,
            "height": height,
            "n_channels": ch,
            "n_pixel_bytes": (width.astype("int64") * height * ch),
            "codec": pd.Series(codecs, index=contents.index),
        }
    )


def decode_image_meta(
    df: DataFrame, passthrough: tuple[str, ...] = (), decoder: str = "fake"
) -> DataFrame:
    """Decode pass over ``(asset_id, content)`` → ``DECODED_META_SCHEMA``.

    ``mapInPandas`` streams Arrow batches through Python: no shuffle, the
    plan stays partition-preserving, and each batch is processed with
    vectorized pandas ops (never per-row Python). At 100 TB this is the
    canonical shape for any decode/feature-extract stage: executors touch
    only their own input splits and the payload bytes never cross the
    wire.

    ``decoder``: ``"fake"`` (default — deterministic, oracle-friendly, no
    codec dependency) or ``"pil"`` (real PNG/JPEG decode where Pillow is
    installed; env-gated smoke: ``CHRONICLES_PIL_SMOKE=1``).  The plan,
    schema, partitioning and batch shape are identical in both.

    ``passthrough`` names extra input columns carried through the Arrow
    batch unchanged (ingest metadata riding along with the decode), so
    callers never need a post-decode join to reattach them."""
    if decoder not in ("fake", "pil"):
        raise ValueError(f"decoder must be 'fake' or 'pil', got {decoder!r}")
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [in_fields["asset_id"]]
        + [in_fields[c] for c in passthrough]
        + [f for f in DECODED_META_SCHEMA.fields if f.name != "asset_id"]
    )
    use_pil = decoder == "pil"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_pil:
                out = _pil_decode_meta(pdf["content"])
            else:
                out = _fake_decode_meta(pdf["content"].map(len))
            for i, c in enumerate(passthrough):
                out.insert(i, c, pdf[c].values)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out

    return df.select("asset_id", "content", *passthrough).mapInPandas(
        decode, schema=out_schema
    )


def sample_frames(
    df: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: emit up to
    ``max_frames`` (asset_id, frame_index, frame_offset) rows per asset by
    striding the payload.  Pure JVM (sequence + explode): the 1→N row
    expansion happens executor-side with no Python and no shuffle; a real
    pipeline would feed these offsets to a decode ``mapInPandas`` stage
    like `decode_image_meta`."""
    n_frames = F.least(
        F.lit(max_frames),
        (F.octet_length(F.col("content")) / every_n_bytes).cast("int") + 1,
    )
    frames = F.sequence(F.lit(0), n_frames - 1)
    return (
        df.select("asset_id", F.explode(frames).alias("frame_index"))
        .withColumn("frame_offset", F.col("frame_index") * every_n_bytes)
    )
