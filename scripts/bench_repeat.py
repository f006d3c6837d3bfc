"""Repeated-run timing for a single queries() entry (default:
retrieval_metrics) at sf0.1 — median + spread, to separate shared-host
noise from a real constant (round-3 verdict "Next round #7").

Usage: python scripts/bench_repeat.py [query] [runs] [sf_dir]
Prints one JSON line with all samples, median, min, max.

Note: the flagship-label queries (minhash_clusters*, dedup_corpus) cache
their labels per session — repeated samples of those would time the cache
hit, not the compute. Use bench.py (fresh session per run) for them.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cs588_data_science_bug_duplicate_detector_spark.session import get_spark


def main() -> None:
    query = sys.argv[1] if len(sys.argv) > 1 else "retrieval_metrics"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("bench-repeat", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[query]
    fn(spark, "/root/testdata/sf0.001").count()  # warmup (UDF workers, codegen)
    samples = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).count()
        samples.append(round(time.time() - t0, 3))
    out = {
        "query": query,
        "sf_dir": sf_dir,
        "samples": samples,
        "median": round(statistics.median(samples), 3),
        "min": min(samples),
        "max": max(samples),
        "spread_pct": round(100 * (max(samples) - min(samples)) / statistics.median(samples), 1),
    }
    spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
