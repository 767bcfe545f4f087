"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(one batch of payloads per Python call, never per-row UDFs). Two
decoders ship:

- ``_fake_decode_batch`` (default): deterministic hash-derived pseudo-
  features — keeps the contract queries replayable (the DuckDB oracle
  recomputes the same sha1 math) and exercises the full Spark plumbing
  (schema, batch shape, partitioning) with no codec dependency.
- ``stdlib_decode_batch``: a REAL decoder for the formats the Python
  stdlib can parse without third-party codecs — RIFF/WAVE PCM audio
  (via ``wave``) and binary netpbm images (P5 PGM / P6 PPM) — emitting
  signal statistics as the feature vector. Formats are sniffed from
  magic bytes; unrecognized payloads fall back to the hash features so
  a mixed corpus decodes in one pass. Install richer codecs
  (PIL/librosa/av) in production via ``set_decoder`` / the ``decoder=``
  argument without touching the plan.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


def _decode_wav(data: bytes) -> np.ndarray | None:
    """RIFF/WAVE PCM -> FEATURE_DIM floats of audio statistics, or None
    if the payload isn't a parseable PCM WAV. Layout:
    [1.0 (audio tag), n_channels, sample_rate/1000, n_frames,
     duration_s, mean, std, min, max, rms, zero_crossing_rate,
     mean(|x|), seg_rms x4 (4-window energy envelope)], samples
    normalized to [-1, 1]."""
    if not data.startswith(b"RIFF") or data[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_ch = w.getnchannels()
            rate = w.getframerate()
            width = w.getsampwidth()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError, struct.error):
        return None
    if width == 1:  # 8-bit WAV is unsigned
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        return None
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = 1.0
    out[1] = n_ch
    out[2] = rate / 1000.0
    out[3] = float(n_frames)
    out[4] = n_frames / rate if rate else 0.0
    if x.size:
        out[5] = x.mean()
        out[6] = x.std()
        out[7] = x.min()
        out[8] = x.max()
        out[9] = float(np.sqrt(np.mean(x * x)))
        out[10] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        out[11] = float(np.mean(np.abs(x)))
        for i, seg in enumerate(np.array_split(x, 4)):
            if seg.size:
                out[12 + i] = float(np.sqrt(np.mean(seg * seg)))
    return out


def _decode_netpbm(data: bytes) -> np.ndarray | None:
    """Binary netpbm (P5 grayscale / P6 RGB, maxval <= 255) -> FEATURE_DIM
    floats of pixel statistics, or None if not parseable. Layout:
    [2.0|3.0 (gray|rgb tag), width, height, channels, maxval,
     mean, std, min, max (all /maxval), channel means x3 (/maxval;
     gray repeats), quadrant means x3 (/maxval: top-left, top-right,
     bottom half)]."""
    if data[:2] not in (b"P5", b"P6"):
        return None
    # header: magic, width, height, maxval as whitespace-separated ASCII
    # tokens; '#' comments run to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":
            nl = data.find(b"\n", pos)
            pos = len(data) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(data) and not data[end : end + 1].isspace():
                end += 1
            tokens.append(data[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    try:
        width, height, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if min(width, height, maxval) <= 0 or maxval > 255:
        return None
    pos += 1  # single whitespace byte after maxval, then raster
    ch = 3 if data[:2] == b"P6" else 1
    need = width * height * ch
    raster = data[pos : pos + need]
    if len(raster) < need:
        return None
    px = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, ch)
    x = px.astype(np.float32) / maxval
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = 2.0 if ch == 1 else 3.0
    out[1] = width
    out[2] = height
    out[3] = ch
    out[4] = maxval
    out[5] = x.mean()
    out[6] = x.std()
    out[7] = x.min()
    out[8] = x.max()
    for i in range(3):
        out[9 + i] = x[:, :, min(i, ch - 1)].mean()
    out[12] = x[: (height + 1) // 2, : (width + 1) // 2].mean()
    out[13] = x[: (height + 1) // 2, (width + 1) // 2 :].mean() if width > 1 else out[12]
    out[14] = x[(height + 1) // 2 :].mean() if height > 1 else out[12]
    out[15] = 0.0
    return out


def stdlib_decode_batch(payloads: pd.Series) -> np.ndarray:
    """Real (non-fake) batch decoder built on the Python stdlib alone:
    PCM WAV audio and binary PGM/PPM images, sniffed per payload from
    magic bytes; anything else (including undecodable bytes) falls back
    to the deterministic hash features so mixed corpora never error.
    Same signature as every decoder: pd.Series[bytes] -> (n, FEATURE_DIM)
    float32. Heavier codecs (JPEG/MP3/MP4) still require third-party
    libraries — register them with ``set_decoder()``."""
    out = _fake_decode_batch(payloads)
    for i, p in enumerate(payloads):
        if p is None:
            continue
        b = bytes(p)
        feat = _decode_wav(b)
        if feat is None:
            feat = _decode_netpbm(b)
        if feat is not None:
            out[i] = feat
    return out


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[pd.Series], np.ndarray] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction: batches of (media_id, kind, payload)
    in, (media_id, kind, n_bytes, feature[FEATURE_DIM]) out. ``decoder``
    overrides the module default for this plan (closure-captured, so it
    ships to executors with the task)."""
    dec = decoder or _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = dec(pdf["payload"])
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
    as ``extract_media_features`` (see ``stdlib_decode_batch`` /
    ``set_decoder``). Returns the media frame with
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
