"""Multimodal column plumbing: binary payloads + typed metadata.

Task-brief tier: image/audio/video are opaque ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The image/audio codec libraries are
NOT in this container, so the byte-level decode is STUBBED — a deterministic
fake decoder that derives pixel/sample tensors from the payload bytes — but
everything Spark-side is real and tested: schemas, partitioning, UDF
signatures, batch shapes, and the feature math downstream of decode
(tests/test_multimodal.py).

Swap ``_fake_decode_image``/``_fake_decode_audio`` for PIL/soundfile calls
and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, "
    "luma_hist array<double>, phash string"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, duration_s double, rms double, "
    "zero_crossings long"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_phash string"


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic luma plane derived from payload bytes.

    Replace with a real codec (PIL.Image.open) when available — the
    container has no image libraries (NotImplementedError would also be
    acceptable here, but a deterministic fake keeps the downstream feature
    math testable end-to-end).
    """
    raw = np.frombuffer(payload or b"", dtype=np.uint8)
    n = width * height
    if len(raw) == 0:
        # null/empty payload -> black frame; np.tile of an empty array stays
        # empty and the reshape below would kill the task otherwise
        return np.zeros((height, width), dtype=np.uint8)
    reps = -(-n // len(raw))
    return np.tile(raw, reps)[:n].reshape(height, width)


def _fake_decode_audio(payload: bytes, sample_rate: int) -> np.ndarray:
    """STUB decoder: deterministic int16 PCM derived from payload bytes."""
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.int16)
    return (raw - 128) * 256


def _phash64(plane: np.ndarray) -> str:
    """Tiny perceptual hash: 8x8 mean-threshold bits of the luma plane."""
    h, w = plane.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            block = plane[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            cells[i, j] = block.mean() if block.size else 0.0
    bits = (cells > cells.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:016x}"


def image_features(spark: SparkSession, media: DataFrame) -> DataFrame:
    """decode -> luma stats + 16-bin histogram + perceptual hash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode is per-item by nature; iterate zip over column arrays
            # (iterrows builds a Series per row — slowest possible idiom)
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist(), pdf["meta"].tolist()
            ):
                w, h = int(meta["width"]), int(meta["height"])
                plane = _fake_decode_image(payload, w, h)
                hist = np.histogram(plane, bins=16, range=(0, 256))[0]
                hist = (hist / max(plane.size, 1)).astype(np.float64)
                rows.append(
                    {
                        "media_id": mid,
                        "width": w,
                        "height": h,
                        "mean_luma": float(plane.mean()),
                        "luma_hist": hist.tolist(),
                        "phash": _phash64(plane),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def audio_features(spark: SparkSession, media: DataFrame) -> DataFrame:
    """decode -> duration / RMS / zero-crossing count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist(), pdf["meta"].tolist()
            ):
                sr = int(meta["sample_rate"])
                pcm = _fake_decode_audio(payload, sr).astype(np.float64)
                zc = int(((pcm[:-1] * pcm[1:]) < 0).sum()) if len(pcm) > 1 else 0
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": sr,
                        "duration_s": len(pcm) / max(sr, 1),
                        "rms": float(np.sqrt((pcm**2).mean())) if len(pcm) else 0.0,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


def sample_frames(spark: SparkSession, media: DataFrame, every_n: int = 10) -> DataFrame:
    """video frame-sampling: one fake-decoded frame every ``every_n``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist(), pdf["meta"].tolist()
            ):
                w, h = int(meta["width"]), int(meta["height"])
                nf = int(meta["n_frames"])
                for fi in range(0, nf, every_n):
                    # deterministic per-frame slice of the payload
                    frame_payload = payload[fi % max(len(payload), 1):] + payload[: fi % max(len(payload), 1)]
                    plane = _fake_decode_image(frame_payload, w, h)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": fi,
                            "frame_phash": _phash64(plane),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_phash"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def resize_images(
    spark: SparkSession, media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """decode -> nearest-neighbor resize to (out_w, out_h) -> re-encode.

    Output keeps the media schema (payload = resized luma plane bytes, meta
    updated) so resize composes with the other stages — the shape of a real
    preprocessing DAG (resize then feature-extract).  Swap the fake
    decode/encode for a real codec and the Spark plumbing is unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys_cache = np.linspace(0, 1, out_h, endpoint=False)
        xs_cache = np.linspace(0, 1, out_w, endpoint=False)
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"].tolist(),
                pdf["kind"].tolist(),
                pdf["payload"].tolist(),
                pdf["meta"].tolist(),
            ):
                w, h = int(meta["width"]), int(meta["height"])
                plane = _fake_decode_image(payload, w, h)
                yi = (ys_cache * h).astype(int)
                xi = (xs_cache * w).astype(int)
                resized = plane[np.ix_(yi, xi)].astype(np.uint8)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": bytearray(resized.tobytes()),
                        "meta": {
                            "width": out_w,
                            "height": out_h,
                            "sample_rate": int(meta["sample_rate"]),
                            "n_frames": int(meta["n_frames"]),
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def synthetic_media(spark: SparkSession, n: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests/bench (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.randint(0, 256, size=rng.randint(256, 2048)).astype(np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": bytearray(payload),
                "meta": {
                    "width": int(rng.randint(16, 64)),
                    "height": int(rng.randint(16, 64)),
                    "sample_rate": 16000,
                    "n_frames": int(rng.randint(20, 80)),
                },
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
