"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(one batch of payloads per Python call, never per-row UDFs). The actual
codec step is STUBBED — the decode libraries (PIL/librosa/av) are not in
this container — behind ``set_decoder``: the default deterministic fake
derives pseudo-features from the payload hash so the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested; swap in a real
decoder in production without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_batch(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed step: FEATURE_DIM
    floats derived from the payload's sha1. Replace via set_decoder()."""
    out = np.zeros((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        digest = hashlib.sha1(bytes(p)).digest()
        raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
        out[i] = (raw % 1000) / 1000.0
    return out


_DECODER: Callable[[pd.Series], np.ndarray] = _fake_decode_batch


def set_decoder(fn: Callable[[pd.Series], np.ndarray]) -> None:
    """Install a real batch decoder (pd.Series[bytes] -> (n, FEATURE_DIM))."""
    global _DECODER
    _DECODER = fn


def real_decode_stub(payloads: pd.Series) -> np.ndarray:
    """The production decode path — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "install a decoder and register it with set_decoder()"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: batches of (media_id, kind, payload)
    in, (media_id, kind, n_bytes, feature[FEATURE_DIM]) out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _DECODER(pdf["payload"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": list(feats),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


def synthesize_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic fake media table exercising the binary plumbing."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.md5(F.col("id").cast("string"))), "utf-8"
        ).cast("binary").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
            F.lit("application/x-fake").alias("mime"),
        ).alias("meta"),
    )
    return df


def frame_sample_plan(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (sequence+explode — the real decode of those frames would run in the
    same mapInPandas slot as extract_media_features)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return media.select(
        "media_id", "kind", F.explode(frames).alias("frame_idx")
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image/video resize *plumbing*: aspect-preserving target dimensions
    computed JVM-side (pure column math — the part that must be right at
    scale: no payload bytes move until the mapInPandas decode slot), with
    the pixel transform itself deferred to the same batched decoder stage
    as ``extract_media_features`` (stubbed in this container, see
    ``real_decode_stub``). Returns the media frame with
    (target_width, target_height, scale) columns added; rows already
    within ``max_side`` carry scale = 1.0."""
    w = F.coalesce(F.col("meta.width"), F.lit(0))
    h = F.coalesce(F.col("meta.height"), F.lit(0))
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(float(max_side)) / longest).otherwise(
        F.lit(1.0)
    )
    return media.withColumns(
        {
            "target_width": F.greatest(
                F.round(w * scale).cast("int"), F.lit(1)
            ),
            "target_height": F.greatest(
                F.round(h * scale).cast("int"), F.lit(1)
            ),
            "scale": F.round(scale, 6),
        }
    )
