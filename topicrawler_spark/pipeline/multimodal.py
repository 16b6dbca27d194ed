"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Decode kernels: PNG (zlib inflate + scanline filter reconstruction) and
WAV PCM (RIFF parse via struct/numpy) are REAL, stdlib-only decoders —
``image_features`` and ``audio_features`` compute actual pixel/PCM
statistics for those formats. Formats that genuinely need external
libraries (JPEG/WebP images, MP3/OGG audio, any video codec) remain
STUBS: strict mode raises ``NotImplementedError``, test mode produces a
deterministic fake derived from the bytes — the Spark-side contract
(schemas, batch shapes, partitioning, UDF signatures) is identical either
way, so swapping in PIL/ffmpeg kernels on a real cluster touches only the
marked functions.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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




# --- real stdlib codecs: PNG and WAV PCM ------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette, expanded to RGB on decode)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG writer (8-bit gray/RGB/RGBA, filter 0, one IDAT) — used
    to build real image fixtures without an imaging library."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (None/Sub/Up/Average/Paeth)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        else:  # Sub/Average/Paeth carry a left dependency: walk the row
            cur = row.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    cp = prev[i - ch] if i >= ch else 0
                    p = a + b - cp
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cp)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cp)
                    cur[i] = (cur[i] + pr) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


def decode_png(content: bytes) -> np.ndarray:
    """Stdlib PNG decoder: chunk walk, zlib inflate, filter reconstruction.
    Supports 8-bit depth, color types gray/RGB/palette/gray-alpha/RGBA,
    non-interlaced (the overwhelmingly common web case). Raises ValueError
    on anything else."""
    if not content.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(_PNG_MAGIC)
    idat, plte = [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
    ch = _PNG_CHANNELS[color]
    img = _png_unfilter(zlib.decompress(b"".join(idat)), w, h, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal 16-bit mono PCM WAV writer — real audio fixtures from numpy."""
    pcm = np.clip(samples, -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1,
        rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Stdlib WAV PCM decoder: RIFF chunk walk, fmt parse, PCM to float32
    mono in [-1, 1]. Supports PCM u8/i16/i32 and IEEE float32. Raises
    ValueError on anything else (e.g. ADPCM, MP3-in-WAV)."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (length,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV (format={audio_format} bits={bits})")
    if n_ch > 1:
        x = x[: len(x) - (len(x) % n_ch)].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def _decode_image_stub(content: bytes, strict: bool) -> np.ndarray:
    """STUB decode for image formats that need external libraries
    (JPEG/WebP/GIF...). Real impl: PIL.Image.open(BytesIO(content)).

    Deterministic fake: a pseudo-image seeded from the content hash, so the
    downstream pipeline (resize, features) has stable inputs to test against.
    """
    if strict:
        raise NotImplementedError(
            "non-PNG image decoding (JPEG/WebP/GIF) requires an imaging library (PIL)"
        )
    h = _content_hash(content) & 0x7FFFFFFF
    rng = np.random.default_rng(h)
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


def decode_image(content: bytes, strict: bool) -> np.ndarray:
    """PNG decodes for real (stdlib kernel above); other formats fall to the
    marked stub (strict mode raises). In non-strict (test) mode a MALFORMED
    PNG (16-bit/interlaced, corrupt IDAT, truncated) falls back to the
    deterministic stub instead of failing the whole Arrow batch — one bad
    blob in crawled bytes must not kill the job; strict mode still raises."""
    if content.startswith(_PNG_MAGIC):
        if strict:
            return decode_png(content)
        try:
            return decode_png(content)
        except (ValueError, zlib.error, struct.error, IndexError):
            return _decode_image_stub(content, strict=False)
    return _decode_image_stub(content, strict)


def resize_bilinear(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Real bilinear resize, pure numpy (vectorized gather + lerp) — the
    standard align-corners=False convention (pixel centers at i + 0.5)."""
    h, w = img.shape[0], img.shape[1]
    oh, ow = size
    squeeze = img.ndim == 2
    arr = img[:, :, None].astype(np.float32) if squeeze else img.astype(np.float32)
    # source coordinates of each output pixel center
    sy = np.clip((np.arange(oh) + 0.5) * (h / oh) - 0.5, 0, h - 1)
    sx = np.clip((np.arange(ow) + 0.5) * (w / ow) - 0.5, 0, w - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (sy - y0)[:, None, None]
    wx = (sx - x0)[None, :, None]
    top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
    bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.rint(out), 0, 255).astype(img.dtype if img.dtype == np.uint8 else np.uint8)
    return out[:, :, 0] if squeeze else out


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
                img = decode_image(b, strict)
                small = resize_bilinear(img, (8, 8))
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

    WAV PCM decodes for real (stdlib RIFF kernel): windows are sized from
    the file's actual sample rate and the RMS is over the decoded [-1,1]
    samples. Other formats (MP3/OGG) fall to the marked stub — strict mode
    raises; test mode treats the blob as 8-bit PCM so window counts scale
    with duration and the feature math has the real shape.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                b = bytes(content) if content is not None else b""
                decoded = None
                if b.startswith(b"RIFF"):
                    # non-strict mode tolerates malformed RIFF blobs (ADPCM,
                    # truncated WAV) by falling to the stub below — one bad
                    # crawled blob must not fail the whole Arrow batch
                    if strict:
                        decoded = decode_wav(b)
                    else:
                        try:
                            decoded = decode_wav(b)
                        except (ValueError, struct.error):
                            decoded = None
                if decoded is not None:
                    x, rate = decoded
                    win = max(1, int(rate * window_ms / 1000))
                    n_windows = max(1, -(-len(x) // win))
                    chunks = [x[i * win : (i + 1) * win] for i in range(n_windows)]
                    energy = [
                        float(np.sqrt(np.mean(c.astype(np.float64) ** 2))) if len(c) else 0.0
                        for c in chunks
                    ]
                    rows.append(
                        {
                            "media_id": media_id,
                            "n_bytes": len(b),
                            "n_windows": n_windows,
                            "energy": energy,
                        }
                    )
                    continue
                if strict:
                    raise NotImplementedError(
                        "non-WAV audio decoding (MP3/OGG) requires soundfile/librosa"
                    )
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
