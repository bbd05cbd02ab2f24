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
    # payload is a real PGM re-encode: header + 32*32 plane
    assert all(
        bytes(p).startswith(b"P5") and len(p) >= 32 * 32 for p in pdf["payload"]
    )
    feats = mm.image_features(spark, resized).toPandas()
    assert len(feats) == len(pdf)
    assert (feats["width"] == 32).all()

def test_resize_deterministic(spark):
    from moira_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, n=12, seed=42)
    a = mm.resize_images(spark, media).toPandas().sort_values("media_id")
    b = mm.resize_images(spark, media).toPandas().sort_values("media_id")
    assert [bytes(x) for x in a.payload] == [bytes(x) for x in b.payload]


# ----------------------------------------------------- decoder seam (round 3)


def test_pgm_roundtrip_and_parser_tolerance():
    import numpy as np

    plane = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = mm.encode_pgm(plane)
    got = mm._decode_pgm(payload)
    assert got is not None and (got == plane).all()
    # comment + extra whitespace per netpbm spec
    fancy = b"P5 # comment\n  4\t3 # again\n255\n" + plane.tobytes()
    got2 = mm._decode_pgm(fancy)
    assert got2 is not None and (got2 == plane).all()
    # truncated body / wrong magic -> refused, not garbage
    assert mm._decode_pgm(payload[:-1]) is None
    assert mm._decode_pgm(b"P6" + payload[2:]) is None


def test_wav_roundtrip():
    import numpy as np

    pcm = (np.sin(np.linspace(0, 20, 1000)) * 10000).astype(np.int16)
    payload = mm.encode_wav(pcm, 8000)
    got = mm._decode_wav(payload)
    assert got is not None
    dec, rate = got
    assert rate == 8000 and (dec == pcm).all()


def test_fseq_roundtrip():
    import numpy as np

    frames = np.random.RandomState(3).randint(0, 256, (7, 5, 6)).astype(np.uint8)
    payload = mm.encode_fseq(frames)
    got = mm._decode_fseq(payload)
    assert got is not None and (got == frames).all()
    assert mm._decode_fseq(payload[:9]) is None


def test_decode_image_gate_prefers_real_parse_and_degrades():
    import numpy as np

    plane = np.random.RandomState(5).randint(0, 256, (9, 11)).astype(np.uint8)
    # real PGM payload: decoded exactly, meta dims ignored
    got = mm.decode_image(mm.encode_pgm(plane), width=99, height=99)
    assert (got == plane).all()
    # garbage payload: deterministic fallback at meta dims, twice identical
    a = mm.decode_image(b"not an image", 8, 4)
    b = mm.decode_image(b"not an image", 8, 4)
    assert a.shape == (4, 8) and (a == b).all()


def test_decode_image_matches_pil_when_available():
    import numpy as np
    import pytest

    if mm._PIL_Image is None:
        pytest.skip("PIL not installed in this container (gate covered by "
                    "the pure-bytes parser path)")
    plane = np.random.RandomState(6).randint(0, 256, (6, 7)).astype(np.uint8)
    import io

    ours = mm._decode_pgm(mm.encode_pgm(plane))
    theirs = np.asarray(
        mm._PIL_Image.open(io.BytesIO(mm.encode_pgm(plane))).convert("L")
    )
    assert (ours == theirs).all()


def test_audio_decode_gate_degrades_deterministically():
    got_pcm, got_rate = mm.decode_audio(b"not audio", 16000)
    again_pcm, again_rate = mm.decode_audio(b"not audio", 16000)
    assert got_rate == again_rate == 16000
    assert (got_pcm == again_pcm).all()
