"""Multimodal plumbing: schemas, batch shapes, determinism of the stub path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kgx.ops import multimodal as mm


def test_decode_shapes_and_determinism(spark):
    assets = mm.synth_assets(spark, n=24)
    dec = mm.decode_images(assets)
    rows = {r.asset_id: r for r in dec.collect()}
    rows2 = {r.asset_id: r for r in mm.decode_images(assets).collect()}
    assert rows.keys() == rows2.keys()
    for i, r in rows.items():
        assert len(bytes(r.pixels)) == r.width * r.height * 3
        assert bytes(r.pixels) == bytes(rows2[i].pixels)  # deterministic stub
    # only image assets decode
    n_images = assets.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images > 0


def test_decoder_override_is_used(spark):
    """The decoder resolves on the driver and closure-ships to workers: a real
    decoder (or any override) activates without touching HAVE_REAL_DECODER
    worker-side. Round-1 had the guard inverted (real decoder raised)."""
    import numpy as np

    from kgx.ops import multimodal as M

    def fake_real(payload, meta):
        return np.full((2, 3, 3), 7, dtype=np.uint8)

    assets = M.synth_assets(spark, n=6)
    rows = M.decode_images(assets, decoder=fake_real).collect()
    assert rows and all(r.width == 3 and r.height == 2 for r in rows)
    assert all(set(bytes(r.pixels)) == {7} for r in rows)


def test_real_decoder_selected_when_available(spark, monkeypatch):
    """Driver-side selection: with HAVE_REAL_DECODER=True, decode_images
    captures _real_decode into the UDF closure (cloudpickle ships it), so a
    real decoder activates end-to-end instead of raising."""
    import numpy as np

    from kgx.ops import multimodal as M

    def probe(payload, meta):  # stands in for the PIL path
        return np.full((1, 2, 3), 9, dtype=np.uint8)

    monkeypatch.setattr(M, "HAVE_REAL_DECODER", True)
    monkeypatch.setattr(M, "_real_decode", probe)
    rows = M.decode_images(M.synth_assets(spark, n=6)).collect()
    assert rows and all(r.width == 2 and r.height == 1 for r in rows)
    assert all(set(bytes(r.pixels)) == {9} for r in rows)


def test_resize_preserves_ids_and_sizes(spark):
    assets = mm.synth_assets(spark, n=12)
    res = mm.resize_images(mm.decode_images(assets), 16, 12).collect()
    assert res and all(r.width == 16 and r.height == 12 for r in res)
    assert all(len(bytes(r.pixels)) == 16 * 12 * 3 for r in res)


def test_image_embeddings_unit_norm(spark):
    assets = mm.synth_assets(spark, n=12)
    embs = mm.image_embeddings(mm.decode_images(assets)).collect()
    assert embs and all(len(r.embedding) == 32 for r in embs)
    for r in embs:
        assert abs(np.linalg.norm(r.embedding) - 1.0) < 1e-5


def test_frame_sampling_fanout(spark):
    assets = mm.synth_assets(spark, n=18)
    frames = mm.sample_frames(assets, fps=1.0)
    per_asset = {
        r.asset_id: r.n for r in frames.groupBy("asset_id").agg(
            F.count("*").alias("n")).collect()
    }
    metas = {
        r.asset_id: r.meta["duration_s"]
        for r in assets.filter(F.col("kind") == "video").collect()
    }
    assert per_asset.keys() == metas.keys()
    for aid, n in per_asset.items():
        assert n == max(1, int(metas[aid] * 1.0))
