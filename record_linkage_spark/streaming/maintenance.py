"""Maintenance CLI for the streaming deployment's state tables.

``compact_state`` is an offline job by design (compacting under a live
stream's checkpoints would desync its file-source bookkeeping), so it
gets its own entry point rather than a flag on the stream runner:

    spark-submit --py-files rls.zip -m record_linkage_spark.streaming.maintenance \\
        --base /wh/stream_base --matches /wh/stream_matches \\
        --out-base /wh/green_base --out-matches /wh/green_matches

Prints one JSON line: {"profiles": n, "tombstones_dropped": n,
"matches": n}. The outputs seed a FRESH deployment (new checkpoint
dirs) — the blue/green rollover pattern; see
``streaming/incremental.py::compact_state`` for semantics and the
``test_compact_state_blue_green_rollover`` equivalence proof.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from record_linkage_spark.streaming.incremental import compact_state


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True, help="epoch-partitioned profile table")
    ap.add_argument("--matches", required=True, help="epoch-partitioned match table")
    ap.add_argument("--out-base", required=True)
    ap.add_argument("--out-matches", required=True)
    args = ap.parse_args(argv)
    if spark is None:
        from record_linkage_spark.session import get_spark

        spark = get_spark("stream_maintenance")
    stats = compact_state(
        spark, args.base, args.matches, args.out_base, args.out_matches
    )
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
