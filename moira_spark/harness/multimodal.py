"""Driver-contract queries for the multimodal tier (rows-only checks).

The media table is synthesized deterministically (operators/multimodal.py
``synthetic_media``, seed=42) so row counts AND values are stable across
runs and cluster sizes.  Since round 3 the payloads are REAL encodings
(binary PGM images, RIFF/WAV audio via the stdlib wave module, FSEQ raw
frame sequences) and the decode layer genuinely parses them — with
PIL/soundfile fast paths where those libraries exist and a deterministic
fallback only for unrecognized bytes.  The Spark-side plumbing — binary
payload column, typed metadata struct, Arrow ``mapInPandas`` feature
extraction, frame-sample fan-out — is the production shape throughout.
Floats are rounded so the driver's value hash is stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from moira_spark.harness import register
from moira_spark.operators import multimodal as mm


def _media(spark: SparkSession) -> DataFrame:
    return mm.synthetic_media(spark, n=60, seed=42)


@register("media_image_features", None)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode -> luma stats + 16-bin histogram + perceptual hash."""
    out = mm.image_features(spark, _media(spark))
    hist = F.transform(F.col("luma_hist"), lambda x: F.round(x, 6))
    return out.select(
        "media_id",
        "width",
        "height",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.concat_ws(",", hist.cast("array<string>")).alias("luma_hist"),
        "phash",
    )


@register("media_audio_features", None)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode -> duration / RMS / zero-crossing count."""
    out = mm.audio_features(spark, _media(spark))
    return out.select(
        "media_id",
        "sample_rate",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
    )


@register("media_resize_features", None)
def media_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize (32x32) composed with feature extraction — the two-stage
    preprocessing DAG: media -> resize -> image_features.  The feature
    stage consumes the resize stage's output schema unchanged, which is the
    composability contract the multimodal tier exists to prove."""
    resized = mm.resize_images(spark, _media(spark), out_w=32, out_h=32)
    out = mm.image_features(spark, resized)
    hist = F.transform(F.col("luma_hist"), lambda x: F.round(x, 6))
    return out.select(
        "media_id",
        "width",
        "height",
        F.round("mean_luma", 6).alias("mean_luma"),
        F.concat_ws(",", hist.cast("array<string>")).alias("luma_hist"),
        "phash",
    )


@register("media_frame_samples", None)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling: one fake-decoded frame phash every 10 frames."""
    return mm.sample_frames(spark, _media(spark), every_n=10)
