"""Multimodal (image/audio/video) columns for training-data pipelines.

Media are opaque ``binary`` columns with a typed metadata struct — the same
pattern as the html:binary input column. All Spark-side plumbing (schemas,
partitioning, Arrow batch shapes, UDF signatures) is real and tested; the
actual codec step is pluggable:

- if a real decoder library (PIL / soundfile / av) is importable it is used;
- otherwise the DETERMINISTIC FAKE codec decodes the engine's own synthetic
  media format (below), so pipelines remain end-to-end testable in
  codec-less environments. Passing ``strict=True`` raises NotImplementedError
  instead of falling back — the clearly-marked stub boundary.

Synthetic media format (deterministic, seeded): a header
``b"FAKEIMG"|b"FAKEAUD"|b"FAKEVID"`` + little-endian dims + raw uint8
payload. ``generate_media`` produces it distributed via mapInPandas.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("frames", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
            False,
        ),
    ]
)

_IMG_MAGIC, _AUD_MAGIC, _VID_MAGIC = b"FAKEIMG", b"FAKEAUD", b"FAKEVID"


def _encode_image(rng, w, h):
    return _IMG_MAGIC + struct.pack("<HH", w, h) + rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()


def _encode_audio(rng, n, sr):
    return _AUD_MAGIC + struct.pack("<II", n, sr) + rng.integers(0, 256, n, dtype=np.uint8).tobytes()


def _encode_video(rng, w, h, frames):
    return (
        _VID_MAGIC
        + struct.pack("<HHH", w, h, frames)
        + rng.integers(0, 256, w * h * frames, dtype=np.uint8).tobytes()
    )


def generate_media(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (round-robin image/audio/video)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng([seed, int(i)])
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    w, h = 16 + i % 17, 16 + i % 13
                    rows.append((i, kind, _encode_image(rng, w, h), (w, h, None, None, "fakeimg")))
                elif kind == "audio":
                    n_s, sr = 800 + (i % 7) * 100, 16000
                    rows.append((i, kind, _encode_audio(rng, n_s, sr), (None, None, None, sr, "fakeaud")))
                else:
                    w, h, fr = 8 + i % 5, 8 + i % 3, 4 + i % 5
                    rows.append((i, kind, _encode_video(rng, w, h, fr), (w, h, fr, None, "fakevid")))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "data", "meta"])

    return spark.range(0, n, 1, parts).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_bytes(b: bytes, strict: bool) -> np.ndarray:
    if b[:7] == _IMG_MAGIC:
        w, h = struct.unpack("<HH", b[7:11])
        return np.frombuffer(b[11:], dtype=np.uint8).reshape(h, w, 3)
    try:  # real codec path (not present in this container)
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    except ImportError:
        if strict:
            raise NotImplementedError(
                "real image codecs (PIL) unavailable in this environment; "
                "only the deterministic FAKEIMG format is decodable"
            )
        raise ValueError("unknown image format and no codec available")


def decode_image_stats(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, mean_r, mean_g, mean_b).

    The decode runs as an Arrow-batched mapInPandas — the shape every real
    decode/feature-extract step uses at scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                arr = _decode_image_bytes(bytes(b), strict)
                out.append(
                    (
                        mid,
                        arr.shape[1],
                        arr.shape[0],
                        float(arr[:, :, 0].mean()),
                        float(arr[:, :, 1].mean()),
                        float(arr[:, :, 2].mean()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run,
        "media_id long, width int, height int, mean_r double, mean_g double, mean_b double",
    )


def image_stats_checked(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, mean_r_e2, chk): the
    value-oracle twin of :func:`decode_image_stats`. The red-channel mean is
    quantized with EXACT integer half-up arithmetic ((200·Σr + wh) // 2wh)
    and ``chk`` is the int64 sum of all decoded payload bytes, so a
    generator-definition manifest (:func:`image_manifest`) can reproduce
    every value without floats — any corruption across encode → shuffle →
    Arrow batch → decode changes chk or the stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                arr = _decode_image_bytes(bytes(b), strict)
                h, w, _ = arr.shape
                wh = w * h
                sum_r = int(arr[:, :, 0].astype(np.int64).sum())
                chk = int(arr.astype(np.int64).sum())
                out.append((mid, w, h, (200 * sum_r + wh) // (2 * wh), chk))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_r_e2", "chk"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, width int, height int, mean_r_e2 long, chk long"
    )


def image_manifest(n: int, seed: int = 42) -> pd.DataFrame:
    """Per-image expected (width, height, sum_r, chk) derived straight from
    the generator DEFINITION (the seeded rng draw — generate_media's image
    branch), skipping the encode/decode byte path entirely. Driver-side and
    bounded (test-harness scale); the distributed path under test is
    generate_media -> image_stats_checked."""
    rows = []
    for i in range(n):
        if i % 3 != 0:  # images occupy the i % 3 == 0 slots
            continue
        rng = np.random.default_rng([seed, int(i)])
        w, h = 16 + i % 17, 16 + i % 13
        payload = rng.integers(0, 256, w * h * 3, dtype=np.uint8).astype(np.int64)
        rows.append((i, w, h, int(payload[0::3].sum()), int(payload.sum())))
    return pd.DataFrame(rows, columns=["media_id", "width", "height", "sum_r", "chk"])


def resize_images(media: DataFrame, size: int = 8, strict: bool = False) -> DataFrame:
    """image rows -> (media_id, thumb: array<int>) — nearest-neighbor resize
    to size x size, flattened grayscale (a feature-extraction proxy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                arr = _decode_image_bytes(bytes(b), strict)
                h, w, _ = arr.shape
                ys = (np.arange(size) * h // size).clip(0, h - 1)
                xs = (np.arange(size) * w // size).clip(0, w - 1)
                gray = arr.mean(axis=2).astype(np.int64)
                thumbs.append([int(v) for v in gray[np.ix_(ys, xs)].ravel()])
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "thumb": thumbs})

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, thumb array<long>"
    )


def sample_video_frames(media: DataFrame, every: int = 2, strict: bool = False) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_idx,
    mean_intensity) — the frame-sampling shape for video pipelines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                b = bytes(b)
                if b[:7] != _VID_MAGIC:
                    if strict:
                        raise NotImplementedError(
                            "real video codecs (av) unavailable; only FAKEVID decodable"
                        )
                    raise ValueError("unknown video format")
                w, h, fr = struct.unpack("<HHH", b[7:13])
                frames = np.frombuffer(b[13:], dtype=np.uint8).reshape(fr, h, w)
                for i in range(0, fr, every):
                    out.append((mid, i, float(frames[i].mean())))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "mean_intensity"])

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_idx int, mean_intensity double"
    )


def audio_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """audio rows -> (media_id, n_samples, sample_rate, rms) features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf["media_id"], pdf["data"]):
                b = bytes(b)
                if b[:7] != _AUD_MAGIC:
                    if strict:
                        raise NotImplementedError(
                            "real audio codecs (soundfile) unavailable; only FAKEAUD decodable"
                        )
                    raise ValueError("unknown audio format")
                n, sr = struct.unpack("<II", b[7:15])
                samples = np.frombuffer(b[15:], dtype=np.uint8).astype(np.float64) - 128.0
                out.append((mid, int(n), int(sr), float(np.sqrt((samples**2).mean()))))
            yield pd.DataFrame(out, columns=["media_id", "n_samples", "sample_rate", "rms"])

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, "media_id long, n_samples int, sample_rate int, rms double"
    )
