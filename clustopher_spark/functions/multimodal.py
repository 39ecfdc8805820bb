"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The default decode step is a deterministic fake (``decode_fn=None``) so
the Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is testable without heavyweight media libraries; pass a real
decoder (PIL/librosa/ffmpeg) in production. For two formats real codecs
ship in-repo with zero extra dependencies
(:mod:`clustopher_spark.functions.codecs`): 24-bit BMP
(``bmp_image_decode`` / ``bmp_resize``), PCM-16 WAV
(``wav_audio_decode``), and uncompressed-DIB AVI video
(``avi_video_frames`` for ``sample_video_frames``) — plug them in via
``decode_fn`` / ``resize_fn``. Compressed codecs (JPEG/H.264/...) still
belong to PIL/ffmpeg in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 16

IMAGE_SCHEMA = (
    "id long, width int, height int, format string, features array<float>"
)

AUDIO_SCHEMA = "id long, sample_rate int, n_samples long, rms double"

FRAME_SCHEMA = "id long, frame_idx int, frame_ts double, frame_hash string"


def _fake_image_decode(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """Deterministic stand-in for PIL.Image.open: dimensions and a feature
    vector derived from the byte digest."""
    digest = hashlib.sha256(data).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    fmt = ["png", "jpeg", "webp"][digest[2] % 3]
    feats = (
        np.frombuffer(digest[:IMAGE_FEATURE_DIM * 2], dtype=np.uint8)
        .astype(np.float32)
        .reshape(IMAGE_FEATURE_DIM, 2)
        .mean(axis=1)
        / 255.0
    )
    return width, height, fmt, feats


def decode_images(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    decode_fn: Callable[[bytes], tuple] | None = None,
) -> DataFrame:
    """binary column -> (id, width, height, format, features) via
    ``mapInPandas`` (Arrow batches; one Python roundtrip per batch, not per
    row). Column-prunes to (id, content) before the Python boundary."""
    decode = decode_fn or _fake_image_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "format": [r[2] for r in rows],
                    "features": [r[3] for r in rows],
                }
            )

    narrow = df.select(F.col(id_col).alias(id_col), F.col(binary_col))
    return narrow.mapInPandas(run, schema=IMAGE_SCHEMA)


def extract_audio_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    decode_fn: Callable[[bytes], tuple] | None = None,
) -> DataFrame:
    """binary -> (id, sample_rate, n_samples, rms). Stub decode derives
    stable pseudo-features from the digest; swap in librosa/soundfile
    via decode_fn."""

    def fake(data: bytes):
        digest = hashlib.sha256(data).digest()
        sr = [8000, 16000, 44100][digest[0] % 3]
        n = 1000 + int.from_bytes(digest[1:4], "big") % 100000
        rms = round(digest[4] / 255.0, 6)
        return sr, n, rms

    decode = decode_fn or fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(bytes(b)) for b in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "sample_rate": [r[0] for r in rows],
                    "n_samples": [r[1] for r in rows],
                    "rms": [r[2] for r in rows],
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, AUDIO_SCHEMA)


RESIZED_SCHEMA = "id long, content binary, width int, height int"


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    binary_col: str = "content",
    id_col: str = "id",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """binary -> binary transform shape (id, content, width, height): the
    resize stage of an image pipeline. The stub "resize" is a deterministic
    re-encoding (digest-prefixed bytes) standing in for PIL's
    decode-resize-encode; the Spark contract — binary in, binary out, typed
    dims attached, one Arrow roundtrip per batch — is the real deliverable.
    """
    tw, th = target

    def fake(data: bytes, w: int, h: int) -> bytes:
        return hashlib.sha256(data + f":{w}x{h}".encode()).digest() + data[:32]

    resize = resize_fn or fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "content": [resize(bytes(b), tw, th) for b in pdf[binary_col]],
                    "width": tw,
                    "height": th,
                }
            )

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, RESIZED_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "id",
    frames_per_video: int = 3,
    decode_fn: Callable[[bytes, int], list] | None = None,
) -> DataFrame:
    """binary video -> exploded (id, frame_idx, frame_ts, frame_hash) rows —
    the frame-sampling fan-out shape (1 row in, N rows out via mapInPandas).
    Real frame extraction (ffmpeg) goes in decode_fn."""

    def fake(data: bytes, n: int):
        digest = hashlib.sha256(data).hexdigest()
        return [
            (i, round(i * 1.5, 3), hashlib.sha256(f"{digest}:{i}".encode()).hexdigest()[:16])
            for i in range(n)
        ]

    decode = decode_fn or (lambda b, n: fake(b, n))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "frame_ts": [], "frame_hash": []}
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                for idx, ts, fh in decode(bytes(blob), frames_per_video):
                    out["id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["frame_ts"].append(ts)
                    out["frame_hash"].append(fh)
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(binary_col)).mapInPandas(run, FRAME_SCHEMA)
