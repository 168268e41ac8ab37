"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — is real and tested; the actual media decoding is STUBBED with a
deterministic fake (this container has no PIL/ffmpeg/torchaudio), behind an
import-try so a real decoder drops in per-worker without touching the plan:

    def _decode_real(payload: bytes) -> np.ndarray:   # pragma: no cover
        from PIL import Image                         # not in this container
        ...

Every operator is an iterator-of-batches mapInPandas (model/decoder loads once
per worker, SURVEY.md §2.11 'Model inference' row), never per-row Python.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

try:  # pragma: no cover — the real decoder path, absent in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_DECODER = True
except ImportError:
    HAVE_REAL_DECODER = False


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus (seeded payload bytes + plausible meta)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 64 + 16 * (i % 8) if kind != "audio" else None,
            "height": 48 + 16 * (i % 6) if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_s": round(rng.uniform(1, 30), 2) if kind != "image" else None,
            "codec": {"image": "png", "audio": "pcm16", "video": "h264"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, ASSETS)


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for image decode: seeded uint8 HxWx3 buffer."""
    w, h = meta["width"], meta["height"]
    seed = zlib.crc32(payload) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _real_decode(payload: bytes, meta: dict) -> np.ndarray:  # pragma: no cover
    """PIL decode path — active automatically when PIL is importable.

    Undecodable payloads (synthetic fixtures, corrupt files — a certainty in
    any web-scale corpus) fall back to the deterministic fake rather than
    killing the task: at 100 TB a job must skip bad media, not die on it.
    """
    import io

    import PIL.Image

    try:
        return np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        return _fake_decode(payload, meta)


DECODED = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.BinaryType(), False),  # HxWx3 uint8, row-major
    ]
)


def decode_images(assets: DataFrame, decoder=None) -> DataFrame:
    """image assets -> raw pixel buffers.

    The decoder is resolved ON THE DRIVER (closure-captured into the batch
    fn): the real PIL path when PIL is importable, else the deterministic
    fake — installing a real decoder activates it without touching the plan.
    ``decoder`` overrides for tests / custom codecs: (payload, meta) -> HxWx3
    uint8 array.
    """
    decode = decoder or (_real_decode if HAVE_REAL_DECODER else _fake_decode)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a heavier decoder would construct its state ONCE here, per worker
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "pixels": []}
            for row in pdf.itertuples(index=False):
                img = decode(bytes(row.payload), row.meta)
                out["asset_id"].append(row.asset_id)
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
                out["pixels"].append(img.tobytes())
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("kind") == "image")
        .select("asset_id", "payload", "meta")
        .mapInPandas(gen, schema=DECODED)
    )


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on raw buffers — numpy-vectorized per batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "pixels": []}
            for row in pdf.itertuples(index=False):
                img = np.frombuffer(bytes(row.pixels), dtype=np.uint8).reshape(
                    row.height, row.width, 3
                )
                ys = (np.arange(out_h) * row.height // out_h).clip(0, row.height - 1)
                xs = (np.arange(out_w) * row.width // out_w).clip(0, row.width - 1)
                res = img[ys][:, xs]
                out["asset_id"].append(row.asset_id)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixels"].append(res.tobytes())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(gen, schema=DECODED)


EMBED = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


def image_embeddings(decoded: DataFrame, dim: int = 32) -> DataFrame:
    """Feature extraction seam: mean-pooled channel histogram (deterministic
    fake for a vision encoder; a real model loads once per worker)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for row in pdf.itertuples(index=False):
                img = np.frombuffer(bytes(row.pixels), dtype=np.uint8)
                hist, _ = np.histogram(img, bins=dim, range=(0, 256))
                v = hist.astype(np.float64)
                n = np.linalg.norm(v)
                vecs.append((v / n if n else v).astype(np.float32).tolist())
                ids.append(row.asset_id)
            yield pd.DataFrame({"asset_id": ids, "embedding": vecs})

    return decoded.mapInPandas(gen, schema=EMBED)


FRAMES = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(assets: DataFrame, fps: float = 1.0) -> DataFrame:
    """video assets -> one fake frame per sampled timestamp (UDTF shape:
    one input row fans out to duration*fps output rows inside the batch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame": []}
            for row in pdf.itertuples(index=False):
                n_frames = max(1, int((row.meta["duration_s"] or 1) * fps))
                for k in range(n_frames):
                    out["asset_id"].append(row.asset_id)
                    out["frame_idx"].append(k)
                    out["frame"].append(
                        hashlib.sha256(bytes(row.payload) + k.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(out)

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload", "meta")
        .mapInPandas(gen, schema=FRAMES)
    )


# --- m01: DuckDB-oracled decode statistics (driver contract entry) -------------------- #
def _cyclic_decode(payload: bytes, meta: dict) -> np.ndarray:
    """SQL-mirrorable decoder: pixel i = payload[i mod len(payload)]. Unlike
    _fake_decode (PCG-seeded noise, not expressible in SQL) this gives the
    decode -> feature chain a closed form an independent engine can verify,
    so the multimodal mapInPandas plumbing gets a value-exact oracle row like
    every other op family."""
    w, h = meta["width"], meta["height"]
    buf = np.frombuffer(payload, dtype=np.uint8)
    idx = np.arange(h * w * 3, dtype=np.int64) % len(buf)
    return buf[idx].reshape(h, w, 3)


def m01_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> synthetic image assets -> decode_images -> per-image pixel
    statistics, end-to-end through the real multimodal plumbing (binary
    payloads, meta struct, Arrow batch decode), with a value-exact DuckDB
    oracle: payload = UTF-8 bytes of the (ASCII-sanitized) first 256 chars of
    each document, decoded cyclically to a (8+id%8) x (4+id%4) RGB buffer, so
    pixel_sum = full_cycles * byte_sum + prefix_byte_sum — pure integer
    arithmetic both engines compute exactly."""
    from kgx.ops import load

    d = load(spark, sf, "documents")
    s = F.regexp_replace(F.substring("text", 1, 256), "[^ -~]", "")
    assets = (
        d.filter(F.col("doc_id") < 64)
        .select(F.col("doc_id").alias("asset_id"), s.alias("s"))
        .filter(F.length("s") > 0)
        .select(
            "asset_id",
            F.lit("image").alias("kind"),
            F.encode(F.col("s"), "UTF-8").alias("payload"),
            F.struct(
                (F.lit(8) + F.col("asset_id") % 8).cast("int").alias("width"),
                (F.lit(4) + F.col("asset_id") % 4).cast("int").alias("height"),
                F.lit(None).cast("int").alias("sample_rate"),
                F.lit(None).cast("double").alias("duration_s"),
                F.lit("raw").alias("codec"),
            ).alias("meta"),
        )
    )
    lens = assets.select(
        "asset_id", F.octet_length("payload").cast("long").alias("n_bytes")
    )
    dec = decode_images(assets, decoder=_cyclic_decode)

    def stats_gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [], "pixel_sum": []}
            for row in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(row.pixels), dtype=np.uint8)
                out["asset_id"].append(row.asset_id)
                out["width"].append(int(row.width))
                out["height"].append(int(row.height))
                out["pixel_sum"].append(int(buf.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    st = dec.mapInPandas(
        stats_gen, schema="asset_id long, width long, height long, pixel_sum long"
    )
    return st.join(F.broadcast(lens), "asset_id").select(
        F.col("asset_id").alias("doc_id"),
        "width",
        "height",
        "n_bytes",
        "pixel_sum",
        F.round(
            F.col("pixel_sum") / (F.col("width") * F.col("height") * 3), 6
        ).alias("mean_pixel"),
    )


M01_SQL = """
WITH t AS (
  SELECT doc_id,
         regexp_replace(substring(text, 1, 256), '[^ -~]', '', 'g') AS s
  FROM documents
  WHERE doc_id < 64
),
v AS (
  SELECT doc_id, s, length(s) AS L,
         8 + doc_id % 8 AS width, 4 + doc_id % 4 AS height
  FROM t WHERE length(s) > 0
),
x AS (
  SELECT doc_id, width, height, L,
         width * height * 3 AS npix,
         COALESCE(list_sum(list_transform(string_split(s, ''), c -> unicode(c))), 0) AS tot,
         CASE WHEN (width * height * 3) % L = 0 THEN 0
              ELSE COALESCE(list_sum(list_transform(
                       string_split(substring(s, 1, (width * height * 3) % L), ''),
                       c -> unicode(c))), 0)
         END AS pre
  FROM v
)
SELECT doc_id, width, height,
       CAST(L AS BIGINT) AS n_bytes,
       CAST((npix // L) * tot + pre AS BIGINT) AS pixel_sum,
       ROUND(CAST((npix // L) * tot + pre AS DOUBLE) / npix, 6) AS mean_pixel
FROM x
"""

QUERIES = {
    "m01_decode_stats": (m01_decode_stats, M01_SQL),
}
