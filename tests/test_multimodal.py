"""Multimodal binary-column plumbing: schema, batch shape, determinism,
stubbed decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openair_spark.ops.multimodal import (
    decode_features, extract_assets, frame_sample, resize_tiles)
from openair_spark.spark.corpus import pages_df


@pytest.fixture(scope="module")
def assets(spark):
    return extract_assets(pages_df(spark, 25, "mm-seed")).cache()


def test_asset_schema_and_metadata(assets):
    rows = assets.collect()
    assert len(rows) == 25
    for r in rows:
        assert r["meta"]["n_bytes"] == len(r["payload"])
        assert len(r["meta"]["sha256"]) == 64
        assert r["asset_id"] == r["meta"]["sha256"][:16]


def test_decode_features_batch_shape_and_determinism(assets, spark):
    # the kernel raises executor-side if an Arrow batch arrives with
    # anything but the pruned (asset_id, kind, payload) columns
    feats = decode_features(assets, fake=True).collect()
    assert len(feats) == 25
    for r in feats:
        assert 8 <= r["width"] <= 15 and 8 <= r["height"] <= 15
        assert 0.0 <= r["mean_luma"] <= 255.0
    again = decode_features(assets, fake=True).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_real_decode_is_gated(assets):
    with pytest.raises(Exception) as exc:
        decode_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_png_assets_real_decode(spark):
    """synth_png_assets emits real PNGs; decode_features(fake=False)
    must reproduce the exact driver-side pixel statistics."""
    import numpy as np

    from openair_spark.ops.multimodal import synth_png_assets, synth_png_image

    assets = synth_png_assets(pages_df(spark, 12, "mm-png")).cache()
    for r in assets.select("meta", "payload").collect():
        assert r["meta"]["content_type"] == "image/png"
        assert bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n"
    feats = decode_features(assets, fake=False).collect()
    assert len(feats) == 12
    by_id = {r["asset_id"]: r for r in feats}
    for row in assets.select("url", "asset_id").collect():
        img = synth_png_image(row["url"]).astype(np.float64)
        luma = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                + 0.114 * img[:, :, 2])
        r = by_id[row["asset_id"]]
        assert (r["height"], r["width"]) == img.shape[:2]
        assert abs(r["mean_luma"] - float(luma.mean())) < 1e-9
    assets.unpersist()


def test_jpeg_assets_real_decode(spark):
    """synth_jpeg_assets emits real baseline JFIFs (mixed subsampling +
    restart intervals); decode_features(fake=False) must decode every
    one with exact dims and mean luma near the PRE-compression source
    (independent truth — a decoder bug cannot cancel against the
    encoder on this stat)."""
    import numpy as np

    from openair_spark.ops.multimodal import (
        jpeg_params_for,
        synth_jpeg_assets,
        synth_jpeg_image,
    )

    assets = synth_jpeg_assets(pages_df(spark, 18, "mm-jpeg")).cache()
    rows = assets.select("url", "asset_id", "meta", "payload").collect()
    assert len(rows) == 18
    subs_seen = set()
    for r in rows:
        assert r["meta"]["content_type"] == "image/jpeg"
        assert bytes(r["payload"])[:3] == b"\xFF\xD8\xFF"
        subs_seen.add(jpeg_params_for(r["url"])[1])
    assert subs_seen == {"4:4:4", "4:2:2", "4:2:0"}, subs_seen
    feats = {r["asset_id"]: r for r in
             decode_features(assets, fake=False).collect()}
    assert len(feats) == 18
    for row in rows:
        src = synth_jpeg_image(row["url"]).astype(np.float64)
        luma = (0.299 * src[:, :, 0] + 0.587 * src[:, :, 1]
                + 0.114 * src[:, :, 2])
        r = feats[row["asset_id"]]
        assert (r["height"], r["width"]) == src.shape[:2]
        assert abs(r["mean_luma"] - float(luma.mean())) < 3.0, row["url"]
    assets.unpersist()


def test_png_resize_real_path(spark):
    from openair_spark.ops.multimodal import synth_png_assets

    assets = synth_png_assets(pages_df(spark, 6, "mm-png2"))
    tiles = resize_tiles(assets, out_h=4, out_w=4, fake=False).collect()
    assert len(tiles) == 6
    assert all(len(r["tile"]) == 16 for r in tiles)
    assert all(0.0 <= v <= 255.0 for r in tiles for v in r["tile"])


def test_resize_and_frames(assets):
    tiles = resize_tiles(assets, out_h=4, out_w=4).collect()
    assert all(len(r["tile"]) == 16 for r in tiles)
    frames = frame_sample(assets, n_frames=3)
    assert frames.count() == 75
    per = frames.groupBy("asset_id").agg(F.countDistinct("frame_sig").alias("n")).collect()
    assert all(r["n"] == 3 for r in per)
