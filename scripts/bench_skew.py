"""Adversarial-skew stress: the full dedup job on a corpus where ONE
global boilerplate farm (farm_frac of all docs, near-identical template)
spans every input split — the hot-bucket design point the per-slice
corpus of bench_scaling.py never reaches.

What it evidences (BENCH/skew.json):
- runtime stays in the same band as the uniform corpus at equal n_docs —
  the cap + min-member star edges keep hot buckets LINEAR in bucket size
  (an uncapped bucket equi-join would generate ~(farm_size)^2 x 32-band
  candidate pairs: at 100k members that is 3.2e11 pairs, i.e. the job
  simply would not finish);
- the farm is still recovered as ONE cluster (max_cluster == farm size)
  — the cap trades pair volume, never connectivity.

Usage: python scripts/bench_skew.py [--docs 1000000] [--farm-frac 0.1]
       [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import ensure_corpus, run_once, CORPUS

SKEW_CORPUS = "/tmp/dupdetect_skew_corpus"


def ensure_skew_corpus(n_docs: int, farm_frac: float, seed: int = 42) -> None:
    marker = os.path.join(SKEW_CORPUS, f"_GEN_{n_docs}_{farm_frac}_{seed}")
    if os.path.exists(marker):
        return
    from cs588_data_science_bug_duplicate_detector_spark.datagen import (
        generate_skewed_pages_distributed,
    )
    from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

    spark = get_spark("skew-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    generate_skewed_pages_distributed(spark, n_docs, farm_frac=farm_frac, seed=seed).write.mode(
        "overwrite"
    ).parquet(SKEW_CORPUS)
    spark.stop()
    # overwrite mode already wiped the directory (old markers included)
    open(marker, "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--farm-frac", type=float, default=0.1)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--skip-uniform", action="store_true",
                    help="reuse an existing uniform-corpus measurement instead of re-running")
    ap.add_argument("--out", default="BENCH/skew.json",
                    help="summary path (so a small smoke run doesn't clobber the 1M record)")
    args = ap.parse_args()

    # heap must be sized BEFORE the first session: legs run in-process and
    # the py4j JVM survives spark.stop(), so a later driver-memory conf is
    # silently ignored (the subprocess-level fix in bench_scaling.run_pinned
    # never applies here). 8g OOMs in the CC count at >=2M docs.
    if args.docs >= 2_000_000:
        os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    stride = max(2, int(round(1.0 / args.farm_frac)))
    farm_size = (args.docs + stride - 1) // stride

    ensure_skew_corpus(args.docs, args.farm_frac)
    skew = run_once(args.cores, corpus=SKEW_CORPUS)
    print("SKEW " + json.dumps(skew), flush=True)

    out = {
        "docs": args.docs,
        "farm_frac": args.farm_frac,
        "expected_farm_size": farm_size,
        "skewed": skew,
        "farm_recovered": skew["max_cluster"] >= farm_size,
    }
    if not args.skip_uniform:
        ensure_corpus(args.docs)
        uniform = run_once(args.cores, corpus=CORPUS)
        print("UNIFORM " + json.dumps(uniform), flush=True)
        out["uniform"] = uniform
        out["skew_slowdown"] = round(skew["sec"] / uniform["sec"], 3)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
