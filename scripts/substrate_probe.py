"""Measure the sandbox VM's own 8->32-core scaling ceiling, independent of
Spark: aggregate throughput of N fully independent, core-pinned, pure-CPU
Python processes (no shared memory, no IPC, no JVM). Any shortfall below
4.0x here is substrate (hypervisor scheduling / shared package resources),
not engine overhead — it bounds what ANY job can show on this box.

Context: the BASELINE.json north rule's two-cluster-size criterion is
evidenced in-sandbox by local[8] vs local[32] runs (scripts/
bench_scaling.py). This probe calibrates that comparison: on a real
cluster, 4x executors bring 4x memory buses and 4x host CPUs, so the
single-box ceiling measured here does not apply.

Usage: python scripts/substrate_probe.py [rounds]   # default 4, interleaved
Prints one JSON line; append it next to the scaling rows in
BENCH/BASELINE.md when recording a run.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CODE = """
import time
n = 0
t_end = time.time() + 4.0
x = 1.0
while time.time() < t_end:
    for _ in range(10000):
        x = x * 1.0000001 + 0.5
        x = x % 1000.0
    n += 10000
print(n)
"""


def run(nproc: int) -> float:
    ps = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", CODE],
            stdout=subprocess.PIPE,
        )
        for i in range(nproc)
    ]
    return sum(int(p.communicate()[0]) for p in ps) / 4.0


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    los, his = [], []
    # interleave 8-proc / 32-proc rounds and take each side's best so a
    # transient background burst cannot land on one side only
    for _ in range(rounds):
        los.append(run(8))
        time.sleep(0.5)
        his.append(run(32))
        time.sleep(0.5)
    lo, hi = max(los), max(his)
    print(
        json.dumps(
            {
                "probe": "pure_cpu_8v32",
                "iters_per_sec_8": round(lo),
                "iters_per_sec_32": round(hi),
                "substrate_ceiling_eff": round(hi / lo / 4, 3),
                "all8": [round(x) for x in los],
                "all32": [round(x) for x in his],
            }
        )
    )


if __name__ == "__main__":
    main()
