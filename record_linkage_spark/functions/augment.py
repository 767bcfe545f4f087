"""M8 — data-augmentation operators over Ditto-serialized text.

Re-expresses the reference's training-data augmenter
(``vendor/FAIR-DA4ER/ditto/ditto_light/augment.py:13-241``) as a
deterministic, distributed Spark column transform. Semantics per op are
kept 1:1 (span deletion, span shuffle, column drop/append, token/length/
symbol/shared-token dropout, symbol insertion, RandAugment-style ``all``
with N=3 draws from {del, swap, drop_col, append_col}, and the 50%%
pair-side flip for ``[SEP]`` sentence pairs), with one intentional
difference: the reference draws from a process-global ``random`` (so its
output is irreproducible run to run), while here every row gets its own
``numpy`` Generator seeded from ``(seed, siphash64(text))`` — the same
row always augments the same way on any executor, any partition order,
any cluster size. That is the property a 100 TB training-data pipeline
actually needs from augmentation: re-running the job regenerates
byte-identical training files.

Execution shape: one Arrow-batched ``pandas_udf``. Token-level span ops
are inherently per-row imperative (the reference is the same loop), so
this is deliberately the "slow path by design" — augmentation runs once
per training-set build, never in the pairwise scoring hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from record_linkage_spark.config import RANDOM_SEED

__all__ = ["AUGMENT_OPS", "augment_serialized"]

AUGMENT_OPS = (
    "del",
    "swap",
    "drop_col",
    "append_col",
    "drop_token",
    "drop_len",
    "drop_sym",
    "drop_same",
    "ins",
    "all",
)

_RAND_ALL_OPS = ("del", "swap", "drop_col", "append_col")
_INS_SYMBOLS = list("-*.,#&")


def _labels(tokens: list[str]) -> list[str]:
    """HD for COL/VAL headers, <SEP> for specials, O for payload
    (reference augment.py:213-220)."""
    out = []
    for tok in tokens:
        if tok in ("COL", "VAL"):
            out.append("HD")
        elif tok in ("[CLS]", "[SEP]"):
            out.append("<SEP>")
        else:
            out.append("O")
    return out


def _sample_span(tokens, labels, span_len, rng):
    candidates = [
        (i, i + span_len - 1)
        for i in range(len(tokens) - span_len + 1)
        if all(lab == "O" for lab in labels[i : i + span_len])
    ]
    if not candidates:
        return -1, -1
    return candidates[rng.integers(0, len(candidates))]


def _col_spans(tokens):
    """(start, end, len) per COL segment, with the reference's [SEP]
    end-trim (augment.py:118-133, 161-176)."""
    starts = [i for i, t in enumerate(tokens) if t == "COL"]
    spans = []
    for i, pos in enumerate(starts):
        if i == len(starts) - 1:
            end = len(tokens) - 1
        else:
            end = starts[i + 1] - 1
        length = end - pos + 1
        if end >= 0 and tokens[end] == "[SEP]":
            end -= 1
            length -= 1
        spans.append((pos, end, length))
    return spans


def _apply_op(tokens, labels, op, rng):
    """One augmentation op; mirrors reference augment.py:34-187."""
    if op == "del":
        span_len = int(rng.integers(1, 3))
        p1, p2 = _sample_span(tokens, labels, span_len, rng)
        if p1 < 0:
            return tokens, labels
        # reference augment.py:42 rebuilds labels from *tokens* here (a
        # slice-source typo that poisons later RandAugment rounds); we
        # keep the label stream consistent instead
        return tokens[:p1] + tokens[p2 + 1 :], labels[:p1] + labels[p2 + 1 :]
    if op == "swap":
        span_len = int(rng.integers(2, 5))
        p1, p2 = _sample_span(tokens, labels, span_len, rng)
        if p1 < 0:
            return tokens, labels
        sub = tokens[p1 : p2 + 1]
        rng.shuffle(sub)
        return (
            tokens[:p1] + list(sub) + tokens[p2 + 1 :],
            labels[:p1] + ["O"] * (p2 - p1 + 1) + labels[p2 + 1 :],
        )
    if op == "drop_len":
        all_lens = [len(t) for t, lab in zip(tokens, labels) if lab == "O"]
        if not all_lens:
            return tokens, labels
        target = all_lens[rng.integers(0, len(all_lens))]
        keep = [
            (t, lab)
            for t, lab in zip(tokens, labels)
            if lab != "O" or len(t) != target
        ]
        return [t for t, _ in keep], [lab for _, lab in keep]
    if op == "drop_sym":
        new_tokens, new_labels = [], []
        for t, lab in zip(tokens, labels):
            if rng.integers(0, 5) != 0 or lab != "O":
                new_tokens.append(t)
                new_labels.append(lab)
            else:
                stripped = "".join(ch if ch.isalnum() else " " for ch in t)
                if stripped != "":
                    new_tokens.append(stripped)
                    new_labels.append(lab)
        return new_tokens, new_labels
    if op == "drop_same":
        left_set, right_set = set(), set()
        left = True
        for t, lab in zip(tokens, labels):
            if lab == "O":
                low = t.lower()
                (left_set if left else right_set).add(low)
            if t == "[SEP]":
                left = False
        same = sorted(left_set & right_set)
        if not same:
            return tokens, labels
        target = same[rng.integers(0, len(same))]
        keep = [
            (t, lab)
            for t, lab in zip(tokens, labels)
            if t.lower() != target or lab != "O"
        ]
        return [t for t, _ in keep], [lab for _, lab in keep]
    if op == "drop_token":
        keep = [
            (t, lab)
            for t, lab in zip(tokens, labels)
            if lab != "O" or rng.integers(0, 5) != 0
        ]
        return [t for t, _ in keep], [lab for _, lab in keep]
    if op == "ins":
        positions = [i for i, lab in enumerate(labels) if lab == "O"]
        if not positions:
            return tokens, labels
        pos = positions[rng.integers(0, len(positions))]
        sym = _INS_SYMBOLS[rng.integers(0, len(_INS_SYMBOLS))]
        return tokens[:pos] + [sym] + tokens[pos:], labels[:pos] + ["O"] + labels[pos:]
    if op == "append_col":
        spans = _col_spans(tokens)
        candidates = [i for i, (_, _, le) in enumerate(spans) if le > 0]
        if len(candidates) < 2:
            return tokens, labels
        pick = rng.choice(len(candidates), size=2, replace=False)
        idx1, idx2 = candidates[int(pick[0])], candidates[int(pick[1])]
        start1, end1, _ = spans[idx1]
        sub_tokens = tokens[start1 : end1 + 1]
        sub_labels = labels[start1 : end1 + 1]
        val_pos = 0
        for i, t in enumerate(sub_tokens):
            if t == "VAL":
                val_pos = i + 1
                break
        sub_tokens, sub_labels = sub_tokens[val_pos:], sub_labels[val_pos:]
        end2 = spans[idx2][1]
        new_tokens, new_labels = [], []
        for i in range(len(tokens)):
            if start1 <= i <= end1:
                continue
            new_tokens.append(tokens[i])
            new_labels.append(labels[i])
            if i == end2:
                new_tokens += sub_tokens
                new_labels += sub_labels
        return new_tokens, new_labels
    if op == "drop_col":
        spans = _col_spans(tokens)
        candidates = [i for i, (_, _, le) in enumerate(spans) if le <= 8]
        if not candidates:
            return tokens, labels
        idx = candidates[rng.integers(0, len(candidates))]
        start, end, _ = spans[idx]
        return tokens[:start] + tokens[end + 1 :], labels[:start] + labels[end + 1 :]
    return tokens, labels


def _augment_one(text: str, op: str, seed: int) -> str:
    """Reference augment_sent (augment.py:190-231), hash-seeded."""
    row_seed = pd.util.hash_array(np.array([text], dtype=object))[0]
    rng = np.random.default_rng([seed, int(row_seed)])
    if " [SEP] " in text and rng.integers(0, 2) == 0:
        left, right = text.split(" [SEP] ", 1)
        text = right + " [SEP] " + left
    tokens = text.split(" ")
    labels = _labels(tokens)
    if op == "all":
        for _ in range(3):  # RandAugment N=3
            chosen = _RAND_ALL_OPS[rng.integers(0, len(_RAND_ALL_OPS))]
            tokens, labels = _apply_op(tokens, labels, chosen, rng)
    else:
        tokens, labels = _apply_op(tokens, labels, op, rng)
    return " ".join(tokens)


def augment_serialized(c, op: str = "all", seed: int = RANDOM_SEED) -> Column:
    """Column expression: augmented copy of a serialized-record/pair text
    column. Deterministic per (row text, op, seed) — safe to regenerate.
    """
    if op not in AUGMENT_OPS:
        raise ValueError(f"unknown augment op {op!r}; one of {AUGMENT_OPS}")

    @F.pandas_udf(T.StringType())
    def _augment(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: None if t is None else _augment_one(t, op, seed)
        )

    return _augment(F.col(c) if isinstance(c, str) else c)
