"""Pairwise comparator column expressions for the comparison vector.

Reference semantics:
  * exact comparator — 1 iff equal, missing on either side -> 0
    (``src/matching/logistic_regression.py:77-82``)
  * gaussian numeric comparator — recordlinkage ``method='gauss'``:
    similarity 1 inside ``offset``, Gaussian decay with ``scale`` beyond
    (``logistic_regression.py:84-87``). Kernel verified empirically against
    the published recordlinkage definition: sim = exp(-0.5 * ((d - offset)
    / scale)^2) for d > offset.
  * canonical pair key — (min(id), max(id)) (``compare.py:27-30``).
All are pure Catalyst expressions (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["exact_match", "gauss_sim", "canonical_pair", "field_diff_count"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_match(a, b) -> Column:
    """1.0 iff both non-null and equal; missing on either side -> 0.0."""
    a, b = _col(a), _col(b)
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(
        (a == b).cast("double")
    )


def gauss_sim(a, b, offset: float, scale: float) -> Column:
    """Gaussian numeric comparator; null on either side -> 0.0."""
    a, b = _col(a), _col(b)
    d = F.abs(a - b)
    decayed = F.exp(-0.5 * F.pow((d - F.lit(offset)) / F.lit(scale), F.lit(2.0)))
    return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(
        F.when(d <= F.lit(offset), F.lit(1.0)).otherwise(decayed)
    )


def canonical_pair(id_a, id_b) -> tuple[Column, Column]:
    """(least, greatest) — order-insensitive pair key (compare.py:27-30)."""
    a, b = _col(id_a), _col(id_b)
    return F.least(a, b), F.greatest(a, b)


def field_diff_count(pairs: list[tuple]) -> Column:
    """Count of differing fields across (a, b) column pairs with NaN==NaN
    semantics via null-safe equality (reference ground_truth.py:115-124)."""
    flags = [(~_col(a).eqNullSafe(_col(b))).cast("int") for a, b in pairs]
    out = flags[0]
    for f in flags[1:]:
        out = out + f
    return out
