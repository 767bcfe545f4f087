"""Multimodal plumbing: binary payload schema, mapInPandas batch decode
(deterministic fake + stdlib-real WAV/netpbm), frame sampling plan."""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd

from record_linkage_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    frame_sample_plan,
    stdlib_decode_batch,
    synthesize_media,
)


def test_media_schema_and_features(spark):
    media = synthesize_media(spark, n=20)
    feats = extract_media_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert r.n_bytes > 0
    # deterministic: same payload -> same feature
    again = extract_media_features(media).collect()
    assert {r.media_id: list(r.feature) for r in feats} == {
        r.media_id: list(r.feature) for r in again
    }


def _make_wav(freq_steps: int = 8, rate: int = 8000, n: int = 800) -> bytes:
    """A real RIFF/WAVE file: 16-bit mono PCM square-ish wave (integer
    math only, fully deterministic)."""
    t = np.arange(n)
    samples = (((t // freq_steps) % 2) * 2 - 1) * 12000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _make_ppm(width: int = 4, height: int = 2) -> bytes:
    """A real binary P6 PPM with a comment line in the header: red row
    then blue row."""
    raster = bytes([255, 0, 0] * width + [0, 0, 255] * width)
    return b"P6\n# planted test image\n%d %d\n255\n" % (width, height) + raster


def test_stdlib_decoder_wav():
    data = _make_wav()
    feats = stdlib_decode_batch(pd.Series([data]))
    f = feats[0]
    assert f[0] == 1.0  # audio tag
    assert f[1] == 1.0  # mono
    assert abs(f[2] - 8.0) < 1e-6  # 8000 Hz
    assert f[3] == 800.0  # frames
    assert abs(f[4] - 0.1) < 1e-6  # duration
    amp = 12000 / 32768.0
    assert abs(f[9] - amp) < 1e-3  # RMS of a square wave = amplitude
    assert abs(f[7] + amp) < 1e-3 and abs(f[8] - amp) < 1e-3
    assert 0.05 < f[10] < 0.2  # zero crossings every 8 samples


def test_stdlib_decoder_ppm_and_fallback():
    ppm = _make_ppm()
    junk = b"not a media file at all"
    feats = stdlib_decode_batch(pd.Series([ppm, junk, None]))
    f = feats[0]
    assert f[0] == 3.0  # rgb tag
    assert (f[1], f[2], f[3], f[4]) == (4.0, 2.0, 3.0, 255.0)
    # half the pixels fully red, half fully blue -> channel means
    assert abs(f[9] - 0.5) < 1e-6 and f[10] == 0.0 and abs(f[11] - 0.5) < 1e-6
    # top half pure red (mean 1/3), bottom half pure blue (mean 1/3)
    assert abs(f[12] - 1 / 3) < 1e-6 and abs(f[14] - 1 / 3) < 1e-6
    # unknown format falls back to the deterministic hash features
    from record_linkage_spark.operators.multimodal import _fake_decode_batch

    assert np.allclose(feats[1], _fake_decode_batch(pd.Series([junk]))[0])
    assert np.allclose(feats[2], 0.0)  # null payload -> zeros


def test_stdlib_decoder_pgm():
    # P5 grayscale 2x2 ramp
    pgm = b"P5 2 2 255\n" + bytes([0, 85, 170, 255])
    f = stdlib_decode_batch(pd.Series([pgm]))[0]
    assert f[0] == 2.0 and (f[1], f[2], f[3]) == (2.0, 2.0, 1.0)
    assert abs(f[5] - (0 + 85 + 170 + 255) / 4 / 255) < 1e-6
    assert f[7] == 0.0 and f[8] == 1.0


def test_extract_features_with_real_decoder(spark):
    """The same mapInPandas slot runs the real decoder end-to-end: plant
    actual WAV/PPM payloads in the media frame and check decoded stats
    come back through Spark."""
    from pyspark.sql import functions as F

    rows = [
        (0, "audio", bytearray(_make_wav())),
        (1, "image", bytearray(_make_ppm())),
        (2, "image", bytearray(b"junk bytes")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).withColumn("meta", F.lit(None).cast("struct<width:int>"))
    got = {
        r.media_id: r
        for r in extract_media_features(media, decoder=stdlib_decode_batch).collect()
    }
    assert got[0].feature[0] == 1.0 and abs(got[0].feature[2] - 8.0) < 1e-6
    assert got[1].feature[0] == 3.0 and got[1].feature[1] == 4.0
    assert got[2].n_bytes == len(b"junk bytes")  # fallback row still flows


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=3)
    plan = frame_sample_plan(media, every_n=1)
    # n_frames = 1 in the fake metadata -> one frame per media row
    assert plan.count() == 3
    assert set(plan.columns) == {"media_id", "kind", "frame_idx"}


def test_resize_plan_aspect_and_noop(spark):
    from record_linkage_spark.operators.multimodal import (
        resize_plan,
        synthesize_media,
    )
    from pyspark.sql import functions as F

    media = synthesize_media(spark, n=4).withColumn(
        "meta",
        F.struct(
            (F.col("media_id").cast("int") * 300 + 100).alias("width"),
            F.lit(200).cast("int").alias("height"),
            F.col("meta.sample_rate"),
            F.col("meta.n_frames"),
            F.col("meta.mime"),
        ),
    )
    out = {r.media_id: r for r in resize_plan(media, max_side=256).collect()}
    # id 0: 100x200 fits -> untouched
    assert (out[0].target_width, out[0].target_height, out[0].scale) == (100, 200, 1.0)
    # id 2: 700x200 -> longest side 700 scaled to 256, aspect preserved
    r = out[2]
    assert r.target_width == 256
    assert r.target_height == round(200 * 256 / 700)
    assert abs(r.scale - 256 / 700) < 1e-6
    # payload bytes are untouched by the plan (no decode in this stage)
    assert out[3].payload is not None
