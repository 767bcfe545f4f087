"""Z-order (Morton-curve) file layout + data-skipping audit.

Why layout is first-class at 100 TB: parquet scans prune FILES (and row
groups) by footer min/max statistics, and those statistics are only
selective if the writer clustered the data. Sorting by one column makes
its stats perfectly selective and every other column's useless; the
Morton curve interleaves the bits of several bucketed columns so that
each file covers a small hyper-rectangle of the key space — point/range
predicates on ANY of the participating columns then skip most files.
This is the same idea behind Delta Lake's OPTIMIZE ZORDER BY and
ClickHouse/Hudi space-filling-curve clustering, implemented here as
pure Catalyst bit arithmetic (shifts + masks, ANSI-overflow-safe — no
additive ops) so the z-value computation fuses into the write-side
scan.

Operators:

- :func:`range_bucket` / :func:`zvalue` — bucket each column into
  ``2^bits`` quantile-free fixed ranges and interleave the bits into
  one long. ``bits * n_cols <= 62`` keeps everything off the sign bit.
- :func:`zorder_layout` — the production write path:
  ``repartitionByRange`` on the z-value (sampled range boundaries, the
  standard distributed total-order shuffle) + ``sortWithinPartitions``
  so every output file covers a contiguous z-range.
- :func:`file_stats` / :func:`skipping_fraction` — the audit: assign
  rows to ``n_files`` equal-depth files in z order (exact ``ntile`` —
  deterministic for the oracle, versus the sampled boundaries of the
  production path), collect per-file min/max per column (exactly what
  parquet footers would carry), and report the fraction of files a
  range predicate can prune. The audit's single-window ntile is
  deliberate: it is a REPORT over a sample/test corpus, not the data
  path; at warehouse scale you read the real footer stats instead.

Determinism / oracle parity: bucketing and interleaving are integer
bit math both engines evaluate identically; the ntile file assignment
tie-breaks on the id column; ``__spark_entry__`` folds ``chk='zorder'``
(z-values, per-file stats, and skipping fractions for z-order vs
single-column layouts, replayed in DuckDB end to end).

References (public): Morton, "A computer oriented geodetic data base"
(IBM 1966); the Delta Lake OPTIMIZE ZORDER BY docs describe the same
file-skipping rationale. Reference-repo parity: the reference's
single-node CSV pipeline has no layout stage; this extends the S4
warehouse-sink surface (``sources/checkpoints.py``) with the write
organization a cluster deployment needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_bucket(col, vmin: float, vmax: float, bits: int) -> Column:
    """Map a numeric column into integer buckets ``[0, 2^bits)`` over
    the fixed range ``[vmin, vmax]`` (clamped — out-of-range values land
    in the edge buckets, so a drifting tail can never corrupt the
    interleave). Fixed ranges, not per-run quantiles: layout must be
    stable across incremental writes or files from different epochs
    cover incomparable key spaces."""
    if vmax <= vmin:
        raise ValueError(f"vmax must exceed vmin, got [{vmin}, {vmax}]")
    if not 1 <= bits <= 32:
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    n = 1 << bits
    c = F.col(col) if isinstance(col, str) else col
    scaled = F.floor(
        (c.cast("double") - F.lit(float(vmin)))
        / F.lit(float(vmax) - float(vmin))
        * F.lit(n)
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n - 1))


def zvalue(bucket_cols: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each bucket column into one
    Morton code: output bit ``i * n_cols + j`` is bit ``i`` of column
    ``j``. Pure shifts/masks/ORs — ANSI-safe (no additive overflow
    path) and fully codegen'd, so the z-value rides the scan."""
    ncols = len(bucket_cols)
    if ncols == 0:
        raise ValueError("at least one bucket column is required")
    if bits * ncols > 62:
        raise ValueError(
            f"bits*n_cols must be <= 62 to stay off the sign bit, "
            f"got {bits}*{ncols}"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return out


def zorder_layout(
    df: DataFrame, zcol: str = "zval", n_partitions: int | None = None
) -> DataFrame:
    """The production write path: range-partition on the z-value (one
    sampled-boundary total-order shuffle, the same cost as any sorted
    write) and sort within partitions, so each output file covers a
    contiguous z-range and its footer min/max are maximally selective
    for every interleaved column. Write the result with
    ``df.write.parquet`` / ``writeTo`` per file-size policy."""
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(parts, F.col(zcol)).sortWithinPartitions(zcol)


def file_stats(
    df: DataFrame,
    id_col: str,
    stat_cols: Sequence[str],
    n_files: int,
    zcol: str = "zval",
) -> DataFrame:
    """Audit-grade per-file statistics: assign rows to ``n_files``
    equal-depth files in (z-value, id) order via exact ``ntile``
    (deterministic, engine-portable), then min/max per column — the
    synthetic equivalent of parquet footer stats. One global-order
    window: a report tool for test/sample corpora, not the data path
    (see module docstring)."""
    w = Window.orderBy(F.col(zcol), F.col(id_col))
    assigned = df.withColumn("file_id", F.ntile(n_files).over(w) - 1)
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return assigned.groupBy("file_id").agg(*aggs)


def skipping_fraction(
    stats: DataFrame, col: str, lo: float, hi: float
) -> DataFrame:
    """One-row frame: the fraction of files a ``col BETWEEN lo AND hi``
    predicate prunes, given :func:`file_stats` output — a file survives
    only if ``[min, max]`` overlaps ``[lo, hi]``. This is exactly the
    decision a parquet reader makes from footer stats, so the report
    predicts real scan savings."""
    overlap = (F.col(f"{col}_max") >= F.lit(lo)) & (
        F.col(f"{col}_min") <= F.lit(hi)
    )
    return stats.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.when(~overlap, 1).otherwise(0)).alias("n_skipped"),
        F.round(
            F.avg(F.when(~overlap, 1.0).otherwise(0.0)), 6
        ).alias("skip_frac"),
    )
