"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
kernels over ``mapInPandas``. The actual media decoding is STUBBED
(the image/audio libs are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the payload hash) stands in —
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthesize_media(spark: SparkSession, n: int, npartitions: int = 8) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                k = kinds[int(i) % 3]
                rng = np.random.Generator(np.random.Philox(key=1337 + int(i)))
                payload = rng.integers(0, 256, size=256 + int(i) % 512, dtype=np.uint8).tobytes()
                rows.append(
                    (int(i), k, mimes[k],
                     64 + int(i) % 64 if k != "audio" else None,
                     48 + int(i) % 48 if k != "audio" else None,
                     1000 + int(i) % 9000 if k != "image" else None,
                     payload)
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n, 1, npartitions).mapInPandas(gen, MEDIA_SCHEMA)


def _probe_pillow():
    """Capability probe: auto-enable the real decoder iff Pillow is
    importable in this environment (it is not in the sandbox image;
    the probe makes the upgrade a zero-code-change event)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


PIL_IMAGE = _probe_pillow()


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8.

    If Pillow is present (capability probe above) the REAL decode runs;
    otherwise this is a stub: ``fake=True`` produces a deterministic
    8x8x3 array seeded by the payload's sha256 — stable across
    processes — and ``fake=False`` raises.
    """
    if not fake:
        if PIL_IMAGE is not None:
            import io
            img = PIL_IMAGE.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(img, dtype=np.uint8)
        raise NotImplementedError(
            "media decoding libraries are not available in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Real pipelines put the GPU/codec call where ``decode_image`` is;
    batch shape, partitioning, and output schema are what this
    function actually demonstrates.
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), fake=fake)
                v = img.astype(np.float32).reshape(-1)
                # deterministic pooled "embedding"
                pooled = v[: (v.size // dim) * dim].reshape(dim, -1).mean(axis=1)
                feats.append((pooled / 255.0).round(6).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = ("media_id long, kind string, height int, width int, "
                  "pixels binary")


def resize_images(media: DataFrame, height: int = 4, width: int = 4,
                  fake: bool = True) -> DataFrame:
    """Arrow-batched image resize over mapInPandas: decode -> nearest-
    neighbor downsample -> re-emit raw pixel bytes + dims.

    The decode is the stubbed step (``decode_image``); the resize math
    (vectorized index gather), the binary-out schema, and the batch
    shape are real — swapping in Pillow/libjpeg touches one line.
    """
    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_px = []
            for payload in pdf["payload"]:
                img = decode_image(bytes(payload), fake=fake)
                h0, w0 = img.shape[:2]
                ys = (np.arange(height) * h0 // height)
                xs = (np.arange(width) * w0 // width)
                out_px.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "height": np.full(len(pdf), height, dtype="int32"),
                    "width": np.full(len(pdf), width, dtype="int32"),
                    "pixels": out_px,
                }
            )

    return media.mapInPandas(kernel, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp.

    The decode itself is stubbed; the explode/planning side is real —
    frame timestamps derive from duration metadata, so the fan-out
    happens without touching payloads (late materialization)."""
    frames = F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_ms"))
    )
