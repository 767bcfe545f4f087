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
