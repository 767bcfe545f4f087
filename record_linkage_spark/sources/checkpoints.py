"""Stage checkpointing with per-partition lineage + metrics sidecars.

The reference's only resumability is file-existence per step
(``run_pipeline.py:91-95``, CSV between stages). Here every stage commits
to a warehouse table (Parquet by default; Iceberg when the runtime has the
jars — the writer is format-gated) with a ``_LINEAGE.json`` sidecar
recording: stage name, config hash, input stage snapshots, per-output-file
row counts (read back from parquet footers — no extra Spark job), schema,
and wall-clock. ``run_stage`` resumes from the committed table when the
config hash matches, giving mid-pipeline restart at stage granularity with
an auditable trail (north_rule: "checkpoints ... with per-partition
lineage and metrics so runs resume mid-pipeline").
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

LINEAGE_FILE = "_LINEAGE.json"


def _iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime jar is on the JVM classpath.

    Must force a real classload: a bare ``spark._jvm.org.apache.iceberg.X``
    is a lazy py4j path object that never touches the classloader, so it
    "succeeds" even with no jar present."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def config_hash(cfg: dict) -> str:
    return hashlib.sha256(
        json.dumps(cfg, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def _file_row_counts(path: str) -> list[dict]:
    """Per-output-file row counts from parquet footers (pyarrow, no job)."""
    import pyarrow.dataset as ds

    try:
        dataset = ds.dataset(path, format="parquet")
        return [
            {"file": os.path.basename(f.path), "rows": f.count_rows()}
            for f in dataset.get_fragments()
        ]
    except Exception:
        return []


@dataclass
class Warehouse:
    """Stage store: Parquet by default, real Iceberg tables when the
    runtime has the jars (``fmt="auto"`` probes; ``fmt="iceberg"``
    forces). The sandbox ships no Iceberg jars, so the gate resolves to
    parquet here; on a cluster with a configured Iceberg catalog the same
    pipeline commits snapshots via ``writeTo(...).createOrReplace()``."""

    root: str
    spark: SparkSession
    fmt: str = "auto"
    catalog: str = "spark_catalog"
    database: str = "rl_warehouse"
    extra_lineage: dict = field(default_factory=dict)

    def resolved_fmt(self) -> str:
        if self.fmt == "auto":
            return "iceberg" if _iceberg_available(self.spark) else "parquet"
        return self.fmt

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def table_ident(self, name: str) -> str:
        return f"{self.catalog}.{self.database}.{name}"

    def lineage_path(self, name: str) -> str:
        if self.resolved_fmt() == "iceberg":
            os.makedirs(os.path.join(self.root, "_lineage"), exist_ok=True)
            return os.path.join(self.root, "_lineage", f"{name}.json")
        return os.path.join(self.table_path(name), LINEAGE_FILE)

    def exists(self, name: str) -> bool:
        if self.resolved_fmt() == "iceberg":
            return self.spark.catalog.tableExists(
                self.table_ident(name)
            ) and os.path.exists(self.lineage_path(name))
        p = self.table_path(name)
        return os.path.exists(os.path.join(p, "_SUCCESS")) and os.path.exists(
            self.lineage_path(name)
        )

    def lineage(self, name: str) -> dict | None:
        try:
            with open(self.lineage_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def read(self, name: str) -> DataFrame:
        if self.resolved_fmt() == "iceberg":
            return self.spark.table(self.table_ident(name))
        return self.spark.read.parquet(self.table_path(name))

    def _write_parquet(
        self, name: str, df: DataFrame, partition_by: list[str] | None
    ) -> list[dict]:
        path = self.table_path(name)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return _file_row_counts(path)

    def _write_iceberg(
        self, name: str, df: DataFrame, partition_by: list[str] | None
    ) -> list[dict]:
        """Commit an Iceberg snapshot (atomic replace). Per-file row counts
        come from the snapshot's manifests via the files metadata table."""
        self.spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {self.catalog}.{self.database}"
        )
        writer = df.writeTo(self.table_ident(name)).using("iceberg")
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        try:
            files = self.spark.sql(
                f"SELECT file_path, record_count FROM {self.table_ident(name)}.files"
            ).collect()
            return [
                {"file": os.path.basename(r.file_path), "rows": int(r.record_count)}
                for r in files
            ]
        except Exception:
            return []

    def _apply_zorder(
        self,
        df: DataFrame,
        zorder_by: list[str],
        zorder_ranges: dict | None = None,
    ) -> tuple[DataFrame, dict]:
        """Cluster the stage output on the Morton code of the named
        numeric columns before writing (``operators/layout.py``), so the
        parquet footer min/max prune scans on EVERY clustered column.

        By default ranges are derived from THIS frame (one extra
        aggregate pass) and recorded in lineage so readers/audits can
        rebuild the exact z-values; nulls sort together under the null
        z-value. Derived-per-write ranges are only valid because
        ``write`` is a FULL OVERWRITE — every file in the table comes
        from the same write and thus the same key space. If append /
        incremental table writes are ever added, pass an explicit
        ``zorder_ranges`` mapping ``{col: (lo, hi)}`` held FIXED across
        epochs (``range_bucket``'s contract), else files from different
        epochs cover incomparable key spaces and skipping audits lie."""
        from pyspark.sql import functions as F

        from record_linkage_spark.operators.layout import (
            range_bucket,
            zorder_layout,
            zvalue,
        )

        bits = min(16, 62 // len(zorder_by))
        if zorder_ranges is not None:
            missing = [c for c in zorder_by if c not in zorder_ranges]
            if missing:
                raise ValueError(
                    f"zorder_ranges missing columns {missing} of {zorder_by}"
                )
            stats = None
        else:
            stats = df.agg(
                *[
                    F.min(F.col(c).cast("double")).alias(f"_mn_{c}")
                    for c in zorder_by
                ],
                *[
                    F.max(F.col(c).cast("double")).alias(f"_mx_{c}")
                    for c in zorder_by
                ],
            ).first()
        buckets, ranges = [], {}
        for c in zorder_by:
            if zorder_ranges is not None:
                mn, mx = zorder_ranges[c]
                mn, mx = float(mn), float(mx)
                if mx <= mn:
                    raise ValueError(
                        f"zorder_ranges[{c!r}] must have hi > lo, got ({mn}, {mx})"
                    )
            else:
                mn = stats[f"_mn_{c}"]
                mx = stats[f"_mx_{c}"]
                mn = 0.0 if mn is None else float(mn)
                mx = mn + 1.0 if mx is None or float(mx) <= mn else float(mx)
            ranges[c] = [mn, mx]
            buckets.append(range_bucket(F.col(c).cast("double"), mn, mx, bits))
        z = df.withColumn("_zval", zvalue(buckets, bits))
        return zorder_layout(z, "_zval").drop("_zval"), {
            "columns": list(zorder_by),
            "bits": bits,
            "ranges": ranges,
            "ranges_source": "explicit" if zorder_ranges is not None else "derived",
        }

    def write(
        self,
        name: str,
        df: DataFrame,
        cfg: dict | None = None,
        inputs: list[str] | None = None,
        metrics: dict | None = None,
        partition_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_ranges: dict | None = None,
    ) -> DataFrame:
        t0 = time.time()
        zorder_meta = None
        if zorder_by:
            df, zorder_meta = self._apply_zorder(df, zorder_by, zorder_ranges)
        fmt = self.resolved_fmt()
        if fmt == "iceberg":
            partitions = self._write_iceberg(name, df, partition_by)
        else:
            partitions = self._write_parquet(name, df, partition_by)
        lineage = {
            "stage": name,
            "format": fmt,
            "config_hash": config_hash(cfg or {}),
            "config": cfg or {},
            "inputs": [
                {
                    "stage": i,
                    "config_hash": (self.lineage(i) or {}).get("config_hash"),
                }
                for i in (inputs or [])
            ],
            "schema": df.schema.simpleString(),
            "partitions": partitions,
            "metrics": metrics or {},
            **({"zorder": zorder_meta} if zorder_meta else {}),
            "write_seconds": round(time.time() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **self.extra_lineage,
        }
        lineage["row_count"] = sum(p["rows"] for p in lineage["partitions"])
        with open(self.lineage_path(name), "w") as f:
            json.dump(lineage, f, indent=2)
        return self.read(name)

    def run_stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        cfg: dict | None = None,
        inputs: list[str] | None = None,
        resume: bool = True,
        metrics_fn: Callable[[DataFrame], dict] | None = None,
        partition_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_ranges: dict | None = None,
    ) -> DataFrame:
        """Compute-or-resume: reuse the committed table iff it exists and was
        produced under the same config hash (stage-level resumability,
        reference E1 analogue but transactional per stage)."""
        if resume and self.exists(name):
            lin = self.lineage(name)
            if lin and lin.get("config_hash") == config_hash(cfg or {}):
                return self.read(name)
        df = fn()
        metrics = metrics_fn(df) if metrics_fn else None
        return self.write(
            name,
            df,
            cfg=cfg,
            inputs=inputs,
            metrics=metrics,
            partition_by=partition_by,
            zorder_by=zorder_by,
            zorder_ranges=zorder_ranges,
        )
