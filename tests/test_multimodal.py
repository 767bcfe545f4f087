"""Multimodal plumbing: binary payload schema, mapInPandas batch decode
(deterministic fake), frame sampling plan."""

from __future__ import annotations

import pytest

from record_linkage_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    frame_sample_plan,
    real_decode_stub,
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


def test_real_decoder_is_stubbed():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        real_decode_stub(pd.Series([b"x"]))


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
