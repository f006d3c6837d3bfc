"""Hardware-ceiling controls for the N-vs-4N scaling evidence.

Measures, OUTSIDE Spark, how this host scales from N to 4N pinned cores on
the two resource classes the dedup job mixes:

1. the actual signature kernel (hashing.dual_signatures — pandas siphash +
   numpy segment reductions; memory-bandwidth-heavy),
2. a pure-ALU burn (xxhash-style integer mixing in a tight numpy loop).

Run with the box otherwise idle:
    python scripts/bench_kernel_scaling.py [--levels 2,8] [--docs-per-proc 30000]

Each level runs `level` worker processes pinned to cores 0..level-1, every
worker computing signatures for the same synthetic batch; throughput =
total docs / wall. Efficiency(N->4N) = throughput_4N / (4 * throughput_N).
This is the ceiling a perfectly-parallel Spark signature stage could reach
— anything the e2e job loses beyond these numbers is software.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(kind: str, docs: int, core: int, out):
    os.sched_setaffinity(0, {core})
    import numpy as np
    import pandas as pd

    from cs588_data_science_bug_duplicate_detector_spark.functions import hashing

    rng = np.random.default_rng(7 + core)
    t0 = time.time()
    if kind == "kernel":
        texts = pd.Series(
            [" ".join(f"w{x}" for x in rng.integers(0, 5000, size=180)) for _ in range(docs)]
        )
        a, b = hashing.minhash_perms(128, 42)
        n_batches = max(1, docs // 10_000)
        per = docs // n_batches
        for i in range(n_batches):
            hashing.dual_signatures(texts.iloc[i * per : (i + 1) * per], 5, a, b)
    else:  # alu
        x = rng.integers(0, 2**62, size=2_000_000, dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            for _ in range(docs // 100):
                x = x * np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> np.uint64(29)
    out.put(time.time() - t0)


def run_level(kind: str, level: int, docs: int) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(kind, docs, c, q)) for c in range(level)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.time() - t0
    return level * docs / wall  # total docs/sec across workers


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--docs-per-proc", type=int, default=30_000)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    out = {}
    for kind in ("kernel", "alu"):
        tl = max(run_level(kind, lo, args.docs_per_proc) for _ in range(args.repeats))
        th = max(run_level(kind, hi, args.docs_per_proc) for _ in range(args.repeats))
        out[kind] = {
            f"docs_per_sec_{lo}c": round(tl, 1),
            f"docs_per_sec_{hi}c": round(th, 1),
            "efficiency": round(th / (4 * tl), 3),
        }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
