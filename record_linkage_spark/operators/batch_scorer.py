"""M5-shaped generic batch pair scorer (the Ditto-harness analogue).

The reference's third matcher serializes each candidate pair to a Ditto
text line and batch-scores it with a GPU transformer
(``src/matching/ditto.py:171-218``). The transformer itself is out of
scope in this container (no torch, no GPU) — but the *harness shape* is
the part that matters at 10^12-pair scale and is fully reproduced here:

  serialize pair (codegen ``concat_ws``, P21)
    -> ``mapInPandas`` batches
    -> model weights shipped ONCE per executor via a Spark broadcast
    -> vectorized batch inference (numpy), no per-row Python
    -> (score, pred) columns back through Arrow

A hashing-vectorizer logistic regression stands in for the transformer:
token/bigram features hashed into a fixed-dim signed bucket vector
(deterministic ``pd.util.hash_array`` siphash), L2-normalized, scored by
a dense weight vector. Swapping in a real transformer means replacing
``_score_matrix`` with a forward pass — the Spark plumbing (broadcast,
batching, schema) is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HASH_DIM = 1024
_HASH_KEY = "rl_batch_scorer0"  # exactly 16 bytes (siphash key requirement)


@dataclass
class HashingTextModel:
    """Dense LR over signed hashed token/bigram counts of the serialized
    pair text. ``weights`` has length ``dim``."""

    weights: list[float]
    intercept: float = 0.0
    threshold: float = 0.5
    dim: int = HASH_DIM

    def to_dict(self) -> dict:
        return {
            "weights": list(self.weights),
            "intercept": self.intercept,
            "threshold": self.threshold,
            "dim": self.dim,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "HashingTextModel":
        return cls(
            weights=list(d["weights"]),
            intercept=float(d["intercept"]),
            threshold=float(d.get("threshold", 0.5)),
            dim=int(d.get("dim", HASH_DIM)),
        )


def featurize_texts(texts, dim: int = HASH_DIM) -> np.ndarray:
    """(n,) tab-joined serialized pair strings -> (n, dim) float32 hashed
    feature matrix (the hashed block is L2-normalized per row).

    A pure bag-of-ngrams of the concatenated pair text carries no
    cross-side signal for a LINEAR stand-in (matching depends on whether
    the two sides *agree*, not on which tokens appear), so the feature
    space encodes agreement explicitly: tokens present on BOTH sides of
    the pair hash into buckets [0, h/2) and tokens present on exactly one
    side into [h/2, h) (h = dim - 2), and the final two slots carry dense
    agreement summaries — token-Jaccard of the two sides and the
    normalized size difference. A linear model can then learn
    "shared mass -> match" — while the harness contract (text column in,
    score matrix out) is exactly what a transformer replacement would
    consume.

    One ``pd.util.hash_array`` call per batch over the flattened token
    list — deterministic across processes (fixed siphash key), no Python
    hash() seeding issues.
    """
    s = pd.Series(texts).fillna("").astype(str)
    n = len(s)
    hdim = dim - 2
    half = hdim // 2
    X = np.zeros((n, dim), dtype=np.float32)
    grams: list[str] = []
    row_ix: list[int] = []
    offs: list[int] = []
    for i, txt in enumerate(s):
        left, _, right = txt.partition("\t")
        lt, rt = set(left.split()), set(right.split())
        shared = lt & rt
        only = lt ^ rt
        union = len(lt) + len(rt) - len(shared)
        if union:
            X[i, hdim] = len(shared) / union
            X[i, hdim + 1] = abs(len(lt) - len(rt)) / union
        grams.extend(shared)
        row_ix.extend([i] * len(shared))
        offs.extend([0] * len(shared))
        grams.extend(only)
        row_ix.extend([i] * len(only))
        offs.extend([half] * len(only))
    if grams:
        h = pd.util.hash_array(
            np.asarray(grams, dtype=object), hash_key=_HASH_KEY
        ).view(np.int64)
        buckets = (h % half + half) % half + np.asarray(offs)
        np.add.at(X, (np.asarray(row_ix), buckets), 1.0)
    norms = np.linalg.norm(X[:, :hdim], axis=1, keepdims=True)
    X[:, :hdim] /= np.maximum(norms, 1e-12)
    return X


def _score_matrix(X: np.ndarray, w: np.ndarray, b: float) -> np.ndarray:
    z = X @ w + b
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


SCORE_SCHEMA = T.StructType(
    [
        T.StructField("id_A", T.StringType()),
        T.StructField("id_B", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("pred", T.IntegerType()),
    ]
)


def score_serialized_pairs(
    pairs: DataFrame, model: HashingTextModel, text_col: str = "pair_text"
) -> DataFrame:
    """(id_A, id_B, pair_text) -> (id_A, id_B, score, pred).

    Weights travel as a real Spark broadcast (one copy per executor, not
    per task closure) — the exact pattern a transformer checkpoint would
    use. Inference is one matrix product per Arrow batch.
    """
    sc = pairs.sparkSession.sparkContext
    bc = sc.broadcast(
        (np.asarray(model.weights, dtype=np.float32), float(model.intercept),
         float(model.threshold), int(model.dim))
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, b, thr, dim = bc.value
        for pdf in batches:
            X = featurize_texts(pdf[text_col], dim)
            p = _score_matrix(X, w, b)
            yield pd.DataFrame(
                {
                    "id_A": pdf["id_A"].astype(str),
                    "id_B": pdf["id_B"].astype(str),
                    "score": p.astype(np.float64),
                    "pred": (p >= thr).astype(np.int32),
                }
            )

    return pairs.select("id_A", "id_B", text_col).mapInPandas(
        _score, schema=SCORE_SCHEMA
    )


def train_hashing_scorer(
    labeled_pairs: DataFrame,
    text_col: str = "pair_text",
    label_col: str = "label",
    dim: int = HASH_DIM,
    reg: float = 0.1,
) -> HashingTextModel:
    """Fit the stand-in LR driver-side on the (bounded) labeled GT sample —
    the same justification as the IRLS fit in ``classifier.py``: the
    reference trains its matcher on one node from the labeled pairs, and
    only *inference* must scale. Scoring stays fully distributed."""
    from record_linkage_spark.operators.classifier import _fit_lr_numpy

    rows = labeled_pairs.select(
        F.col(text_col).alias("t"), F.col(label_col).cast("double").alias("y")
    ).collect()
    if not rows:
        return HashingTextModel(weights=[0.0] * dim, dim=dim)
    X = featurize_texts([r.t for r in rows], dim).astype(np.float64)
    y = np.array([r.y for r in rows], dtype=np.float64)
    w, b = _fit_lr_numpy(X, y, reg=reg)
    return HashingTextModel(
        weights=[float(v) for v in w], intercept=b, dim=dim
    )


PAIR_TEXT_FIELDS = [
    "first_text_norm",
    "last_text_norm",
    "first_role",
    "primary_tool",
    "n_turns",
    "n_tokens",
]


def add_pair_text(hydrated: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Hydrated pair table -> + ``pair_text``: both sides Ditto-serialized
    (P21 ``serialize_record``, codegen) and tab-joined — the input format
    of the reference's transformer matcher (``ditto_format.py:55-74``)."""
    from record_linkage_spark.functions.text import serialize_record

    fields = fields or PAIR_TEXT_FIELDS
    left = serialize_record([(f, F.col(f + "_A")) for f in fields])
    right = serialize_record([(f, F.col(f + "_B")) for f in fields])
    return hydrated.withColumn("pair_text", F.concat_ws("\t", left, right))
