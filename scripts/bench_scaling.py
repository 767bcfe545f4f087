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
import shutil
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
from record_linkage_spark.operators.classifier import LinearModel, score_pairs
from record_linkage_spark.operators.features import FEATURE_INPUT_COLS, add_features
from record_linkage_spark.operators.ground_truth import hydrate_pairs
from record_linkage_spark.operators.rollup import rollup_conversations
from record_linkage_spark.synth.transcripts import generate_transcripts, transcripts_table

cores = {cores}
# ParallelGC + a big heap: the timed pass allocates heavily across all
# task threads of ONE JVM (codegen rows + array intersections); G1's
# concurrent cycles at 32 threads on a default heap cost ~25% throughput
# (measured), turning a scaling measurement into a GC measurement.
spark = get_spark("bench_scaling", master=f"local[{{cores}}]", shuffle_partitions=max(cores * 2, 8),
                  extra_conf={{"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}})
raw = generate_transcripts(spark, n_entities={entities}, dup_rate=1.6)
profiles = rollup_conversations(transcripts_table(raw)).localCheckpoint()
n_convs = profiles.count()
# same hash-bucket pair workload family as bench.py's headline but 4x
# deeper buckets (~160 profiles -> ~12.7k pairs each): the timed pass
# must be long enough (>>10x fixed per-pass cost: scheduling, Arrow
# worker ramp, final agg barrier) that Amdahl overhead doesn't masquerade
# as a scaling loss. Deterministic, identical at any parallelism (no
# rand / monotonic ids anywhere).
n_groups = max(n_convs // 160, 1)
bucket = F.pmod(F.xxhash64(F.lit(7), F.col("conv_id")), F.lit(n_groups))
pa = profiles.select(F.col("conv_id").alias("id_A"), bucket.alias("b"))
pb = profiles.select(F.col("conv_id").alias("id_B"), bucket.alias("b"))
pairs = pa.join(pb, "b").filter(F.col("id_A") < F.col("id_B")).select("id_A", "id_B")
# hydration is one-time pipeline setup (dominated by a serial broadcast
# build of the 64k-profile dim table) — materialize it untimed so the
# measured section is the *pairwise scoring* path the north_rule's
# throughput criterion names: Arrow JW kernels + codegen comparators +
# set-Jaccard + FS-LR score + aggregate.
hyd = hydrate_pairs(pairs, profiles, FEATURE_INPUT_COLS, num_partitions=96)
# slim the checkpointed payload to exactly what the kernels read: texts
# truncated to the JW kernel's 48-char cap (bit-identical scores); the
# token hash set stays as the one large column (Jaccard needs it all).
proj = []
for c in hyd.columns:
    if c.startswith("first_text_norm") or c.startswith("last_text_norm"):
        proj.append(F.substring(c, 1, 48).alias(c))
    else:
        proj.append(F.col(c))
hydrated = hyd.select(*proj).localCheckpoint()
hydrated.count()
model = LinearModel(
    weights=[2.0, 1.0, 1.5, 0.8, 0.6, 0.3, 0.5, 1.2, 0.4, 0.3, 0.8, 0.8, 0.8, 0.4, 1.0, 2.0],
    intercept=-6.0, threshold=0.5)
# One untimed warmup pass first (Python-worker fork + codegen compile are
# per-JVM one-offs, not throughput), then best-of-2 steady-state passes.
def run_pass():
    t0 = time.time()
    scored = score_pairs(add_features(hydrated), model)
    agg = scored.agg(F.count("*").alias("n"), F.sum("pred").cast("long").alias("s")).first()
    return time.time() - t0, agg.n, int(agg.s)

run_pass()  # warmup
results = [run_pass() for _ in range(3)]
ns = {{r[1] for r in results}}; ss = {{r[2] for r in results}}
assert len(ns) == 1 and len(ss) == 1
dt = min(r[0] for r in results)
n, s1 = results[0][1], results[0][2]
print("RESULT " + json.dumps({{"cores": cores, "n_pairs": n, "seconds": dt,
      "pairs_per_sec": n / dt if dt else 0, "checksum_pred_sum": s1}}))
spark.stop()
"""


def run_one(cores: int, entities: int, repo: str) -> dict:
    code = WORKER.format(cores=cores, entities=entities, repo=repo)
    cmd = [sys.executable, "-c", code]
    # pin the whole process tree (JVM + Python UDF workers) to `cores`
    # physical CPUs: local[N] alone only limits concurrent *task slots* —
    # JVM shuffle/serialization threads and Arrow workers would still
    # spill onto every core of the machine, silently inflating the
    # small-N run and corrupting the N-vs-4N efficiency ratio.
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        timeout=3600,
        env={**os.environ, "SPARK_DRIVER_MEM": "64g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--entities", type=int, default=40000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # the sandbox VM is noisy (shared host): interleave N / 4N rounds and
    # take each config's best, so a transient neighbor burst can't land on
    # one config only and corrupt the ratio
    los, his = [], []
    for _ in range(args.rounds):
        los.append(run_one(args.n, args.entities, repo))
        his.append(run_one(args.n * 4, args.entities, repo))
    lo = max(los, key=lambda r: r["pairs_per_sec"])
    hi = max(his, key=lambda r: r["pairs_per_sec"])
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
