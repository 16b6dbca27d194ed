"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The decode kernels themselves are STUBS in this environment (no image/audio
libraries in the container): each kernel either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
derived from the bytes (test mode) — the Spark-side contract (schemas,
batch shapes, partitioning, UDF signatures) is real and tested, so swapping
in PIL/ffmpeg kernels on a real cluster touches only the marked functions.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha_hash", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _content_hash(content: bytes) -> int:
    """Deterministic 63-bit content hash (SHA-256 prefix). Python's builtin
    ``hash(bytes)`` is PYTHONHASHSEED-randomized, which would make results
    differ across driver restarts and mixed-worker clusters."""
    return int.from_bytes(hashlib.sha256(content).digest()[:8], "big") & 0x7FFFFFFFFFFFFFFF


def _decode_image_stub(content: bytes, strict: bool) -> np.ndarray:
    """STUB image decode. Real impl: PIL.Image.open(BytesIO(content)).

    Deterministic fake: a pseudo-image seeded from the content hash, so the
    downstream pipeline (resize, features) has stable inputs to test against.
    """
    if strict:
        raise NotImplementedError("image decoding requires an imaging library (PIL)")
    h = _content_hash(content) & 0x7FFFFFFF
    rng = np.random.default_rng(h)
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


def _resize_stub(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """STUB resize (nearest-neighbor subsample — real impl uses PIL/cv2)."""
    ys = np.linspace(0, img.shape[0] - 1, size[0]).astype(int)
    xs = np.linspace(0, img.shape[1] - 1, size[1]).astype(int)
    return img[np.ix_(ys, xs)]


def image_features(
    media: DataFrame, feature_dim: int = 16, strict: bool = False
) -> DataFrame:
    """binary -> decoded -> resized -> feature vector, one Arrow pass.

    ``mapInPandas`` streams record batches: bounded memory regardless of blob
    sizes, no row-at-a-time Python.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                img = _decode_image_stub(b, strict)
                small = _resize_stub(img, (8, 8))
                # feature stub: channel-mean blocks flattened to feature_dim
                flat = small.astype(np.float32).mean(axis=2).flatten()
                feats = flat[:feature_dim] / 255.0
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(b),
                        "sha_hash": np.int64(_content_hash(b)),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "sha_hash", "features"])

    return media.filter(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        gen, IMAGE_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """video binary -> sampled frame rows (1:N explode via mapInPandas).

    STUB decoder (real impl: ffmpeg/pyav); frame bytes are deterministic
    slices of the source blob so row counts, ordering and schema are real.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if strict:
                    raise NotImplementedError("video decoding requires ffmpeg/pyav")
                b = bytes(content) if content is not None else b""
                dur = int(duration) if duration is not None else 0
                n_frames = max(1, dur // every_ms)
                for i in range(n_frames):
                    lo = (i * 97) % max(len(b), 1)
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": i,
                            "ts_ms": i * every_ms,
                            "frame": b[lo : lo + 64],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "content", "duration_ms"
    ).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_windows", IntegerType()),
        StructField("energy", ArrayType(FloatType())),  # per-window RMS energy
    ]
)


def audio_features(
    media: DataFrame, window_ms: int = 500, strict: bool = False
) -> DataFrame:
    """audio binary -> per-window energy features, one Arrow pass.

    STUB decoder (real impl: soundfile/librosa load -> PCM frames); the fake
    treats the blob as 8-bit PCM so window counts scale with duration and the
    feature math (windowed RMS over a sample array) is the real shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if strict:
                    raise NotImplementedError("audio decoding requires soundfile/librosa")
                b = bytes(content) if content is not None else b""
                dur = int(duration) if duration is not None else 0
                n_windows = max(1, dur // window_ms)
                samples = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
                if len(samples) == 0:
                    samples = np.zeros(n_windows, dtype=np.float32)
                chunks = np.array_split(samples, n_windows)
                energy = [float(np.sqrt(np.mean((c / 255.0) ** 2))) if len(c) else 0.0 for c in chunks]
                rows.append(
                    {
                        "media_id": media_id,
                        "n_bytes": len(b),
                        "n_windows": n_windows,
                        "energy": energy,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "n_windows", "energy"])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "content", "duration_ms"
    ).mapInPandas(gen, AUDIO_FEATURES_SCHEMA)
