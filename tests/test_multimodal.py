"""Multimodal binary-column operator tests: metadata extraction, exact
binary dedup, the mapInPandas decode plumbing (schema + batch shape), and
frame sampling. Builder-brief extension — no reference counterpart."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from chronicles_spark.operators import multimodal as MM


@pytest.fixture()
def assets(spark):
    rows = [
        Row(doc_id=1, text="hello world"),
        Row(doc_id=2, text="hello world"),  # exact dup of 1
        Row(doc_id=3, text="something else entirely"),
        Row(doc_id=4, text="x" * 10000),  # large payload, multi-frame
    ]
    return MM.as_binary_assets(spark.createDataFrame(rows))


def test_binary_assets_schema(assets):
    kinds = dict((f.name, f.dataType.simpleString()) for f in assets.schema.fields)
    assert kinds == {
        "asset_id": "bigint",
        "content": "binary",
        "media_type": "string",
    }


def test_binary_meta_matches_hashlib(assets):
    out = {r["asset_id"]: r for r in MM.with_binary_meta(assets).collect()}
    assert out[1]["byte_len"] == 11
    assert out[1]["content_sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert out[1]["magic_bytes"] == b"hell".hex().upper()


def test_dedup_binary_exact_groups(assets):
    groups = MM.dedup_binary_exact(assets).collect()
    assert len(groups) == 1
    assert groups[0]["n_assets"] == 2
    assert groups[0]["keep_id"] == 1


def test_decode_meta_schema_and_determinism(assets):
    out = MM.decode_image_meta(assets)
    assert out.schema == MM.DECODED_META_SCHEMA
    rows = {r["asset_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    # fake decode derives dims from byte length only — dup payloads agree
    assert rows[1]["width"] == 16 + 11 % 16
    assert rows[1]["height"] == 16 + (11 // 7) % 16
    assert (rows[1]["width"], rows[1]["height"]) == (rows[2]["width"], rows[2]["height"])
    assert rows[4]["n_pixel_bytes"] == rows[4]["width"] * rows[4]["height"] * 3


def test_decode_meta_is_mapinpandas_no_shuffle(assets):
    plan = MM.decode_image_meta(assets)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # partition-preserving: no shuffle


def test_frame_sample_strides_payload(assets):
    rows = MM.sample_frames(assets, every_n_bytes=4096, max_frames=8).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 11-byte payloads: one frame at offset 0
    assert [(r["frame_index"], r["frame_offset"]) for r in by_asset[1]] == [(0, 0)]
    # 10000-byte payload: 10000 // 4096 + 1 = 3 frames
    assert sorted(r["frame_offset"] for r in by_asset[4]) == [0, 4096, 8192]


# -- round 13: env-gated REAL-codec smoke (the moto pattern) ------------------
# Retires the deterministic-fake caveat wherever the dependency exists:
# with CHRONICLES_PIL_SMOKE=1 and Pillow importable, decode_image_meta's
# decoder="pil" path must decode REAL PNG bytes through the identical
# Arrow/mapInPandas plumbing and agree with the declared schema.


def test_pil_real_codec_smoke(spark):
    import os

    if os.environ.get("CHRONICLES_PIL_SMOKE") != "1":
        pytest.skip("set CHRONICLES_PIL_SMOKE=1 (and install Pillow) to "
                    "run the real-codec decode smoke")
    Image = pytest.importorskip("PIL.Image")
    import io

    def png_bytes(w, h, mode="RGB"):
        buf = io.BytesIO()
        color = 7 if mode == "L" else (7, 8, 9)
        Image.new(mode, (w, h), color=color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        Row(asset_id=1, content=bytearray(png_bytes(20, 10)),
            media_type="image/png"),
        Row(asset_id=2, content=bytearray(png_bytes(3, 5)),
            media_type="image/png"),
        Row(asset_id=3, content=bytearray(png_bytes(8, 8, mode="L")),
            media_type="image/png"),
    ]
    df = spark.createDataFrame(rows)
    out = MM.decode_image_meta(df, passthrough=("media_type",),
                               decoder="pil")
    assert out.schema == MM.decode_image_meta(
        df, passthrough=("media_type",)
    ).schema  # identical plumbing, decoder-independent schema
    got = {r["asset_id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (
        20, 10, 3)
    assert got[1]["codec"] == "png"
    assert got[1]["n_pixel_bytes"] == 20 * 10 * 3
    assert (got[2]["width"], got[2]["height"]) == (3, 5)
    assert got[3]["n_channels"] == 1  # grayscale
    assert got[3]["media_type"] == "image/png"


def test_decode_rejects_unknown_decoder(assets):
    with pytest.raises(ValueError, match="decoder"):
        MM.decode_image_meta(assets, decoder="ffmpeg")
