"""Two-parallelism scaling benchmark (the sandbox stand-in for N vs 4N
executors, per BASELINE.json): run the same pairwise-scoring job at
local[N] and local[4N] in fresh JVMs, report throughput at both and the
scaling efficiency  eff = (thr_4N / thr_N) / 4.

The job is hash-deterministic (no rand/monotonic ids), so both runs score
the *identical* pair set — apples-to-apples by construction.

Usage: python scripts/bench_scaling.py [--n 8] [--entities 40000]
Writes/updates BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from record_linkage_spark.session import get_spark
from record_linkage_spark.operators.blocking import candidate_pairs
from record_linkage_spark.operators.classifier import LinearModel, score_pairs
from record_linkage_spark.operators.features import FEATURE_INPUT_COLS, add_features
from record_linkage_spark.operators.ground_truth import hydrate_pairs
from record_linkage_spark.operators.rollup import rollup_conversations
from record_linkage_spark.synth.transcripts import generate_transcripts, transcripts_table

cores = {cores}
spark = get_spark("bench_scaling", master=f"local[{{cores}}]", shuffle_partitions=max(cores * 2, 8))
raw = generate_transcripts(spark, n_entities={entities}, dup_rate=1.6)
profiles = rollup_conversations(transcripts_table(raw)).localCheckpoint()
profiles.count()
cands = candidate_pairs(profiles, "B1").localCheckpoint()
n_cands = cands.count()
cols = sorted(set(FEATURE_INPUT_COLS) | {{"text_len_bucket"}})
hydrated = hydrate_pairs(cands.select("id_A", "id_B"), profiles, cols)
model = LinearModel(
    weights=[2.0, 1.0, 1.5, 0.8, 0.6, 0.3, 0.5, 1.2, 0.4, 0.3, 0.8, 0.8, 0.8, 0.4, 1.0, 2.0],
    intercept=-6.0, threshold=0.5)
t0 = time.time()
scored = score_pairs(add_features(hydrated), model)
n = scored.count()
dt = time.time() - t0
chk = scored.agg(F.sum("pred").cast("long").alias("s")).first().s
print("RESULT " + json.dumps({{"cores": cores, "n_pairs": n, "seconds": dt,
      "pairs_per_sec": n / dt if dt else 0, "checksum_pred_sum": int(chk)}}))
spark.stop()
"""


def run_one(cores: int, entities: int, repo: str) -> dict:
    code = WORKER.format(cores=cores, entities=entities, repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_DRIVER_MEM": "24g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--entities", type=int, default=40000)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    lo = run_one(args.n, args.entities, repo)
    hi = run_one(args.n * 4, args.entities, repo)
    assert lo["n_pairs"] == hi["n_pairs"], "determinism violated across parallelism"
    assert lo["checksum_pred_sum"] == hi["checksum_pred_sum"], (
        "prediction checksum differs across parallelism"
    )
    eff = (hi["pairs_per_sec"] / lo["pairs_per_sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_Nx4",
        "value": round(eff, 3),
        "n_cores": args.n,
        "n4_cores": args.n * 4,
        "entities": args.entities,
        "n_pairs": lo["n_pairs"],
        "throughput_N": round(lo["pairs_per_sec"], 1),
        "throughput_4N": round(hi["pairs_per_sec"], 1),
        "seconds_N": round(lo["seconds"], 2),
        "seconds_4N": round(hi["seconds"], 2),
        "identical_outputs": True,
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = os.path.join(repo, "BENCH", "BASELINE.md")
    with open(md, "a") as f:
        f.write(
            f"\n## scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"| cores | pairs | seconds | pairs/s |\n|---|---|---|---|\n"
            f"| {args.n} | {lo['n_pairs']} | {lo['seconds']:.2f} | {lo['pairs_per_sec']:.0f} |\n"
            f"| {args.n * 4} | {hi['n_pairs']} | {hi['seconds']:.2f} | {hi['pairs_per_sec']:.0f} |\n\n"
            f"scaling efficiency (N={args.n} -> 4N={args.n * 4}): **{eff:.3f}** "
            f"(target >= 0.8); outputs bit-identical across parallelism: yes "
            f"(pred-sum checksum {lo['checksum_pred_sum']}).\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
