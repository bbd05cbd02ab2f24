"""Multimodal plumbing tests: schemas, batch shapes, deterministic features."""

from __future__ import annotations

from moira_spark.operators import multimodal as mm


def test_image_features(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.image_features(spark, media).toPandas()
    assert len(out) == 10  # every third synthetic row is an image
    assert set(out.columns) == {
        "media_id", "width", "height", "mean_luma", "luma_hist", "phash",
    }
    assert all(len(h) == 16 for h in out.luma_hist)
    assert all(abs(sum(h) - 1.0) < 1e-9 for h in out.luma_hist)
    assert all(len(p) == 16 for p in out.phash)  # 64-bit hex


def test_audio_features(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.audio_features(spark, media).toPandas()
    assert len(out) == 10
    assert (out.duration_s > 0).all()
    assert (out.rms > 0).all()


def test_frame_sampling(spark):
    media = mm.synthetic_media(spark, n=30)
    out = mm.sample_frames(spark, media, every_n=10).toPandas()
    assert (out.frame_idx % 10 == 0).all()
    # every video contributed ceil(n_frames/10) frames
    assert out.media_id.nunique() == 10


def test_deterministic_across_runs(spark):
    media = mm.synthetic_media(spark, n=12)
    a = mm.image_features(spark, media).toPandas().sort_values("media_id")
    b = mm.image_features(spark, media).toPandas().sort_values("media_id")
    assert a.phash.tolist() == b.phash.tolist()
    assert a.mean_luma.tolist() == b.mean_luma.tolist()


def test_partitioning_invariance(spark):
    media = mm.synthetic_media(spark, n=30)
    one = mm.image_features(spark, media.repartition(1)).toPandas().sort_values("media_id")
    many = mm.image_features(spark, media.repartition(8)).toPandas().sort_values("media_id")
    assert one.phash.tolist() == many.phash.tolist()


def test_resize_composes_with_features(spark):
    from moira_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=30, seed=42)
    resized = mm.resize_images(spark, media, out_w=32, out_h=32)
    pdf = resized.toPandas()
    assert (pdf["kind"] == "image").all()
    assert all(m["width"] == 32 and m["height"] == 32 for m in pdf["meta"])
    assert all(len(p) == 32 * 32 for p in pdf["payload"])
    feats = mm.image_features(spark, resized).toPandas()
    assert len(feats) == len(pdf)
    assert (feats["width"] == 32).all()

def test_resize_deterministic(spark):
    from moira_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=12, seed=42)
    a = mm.resize_images(spark, media).toPandas().sort_values("media_id")
    b = mm.resize_images(spark, media).toPandas().sort_values("media_id")
    assert [bytes(x) for x in a.payload] == [bytes(x) for x in b.payload]
