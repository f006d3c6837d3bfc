"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
measurement — this file is where iteration happens; see guide §1.4).

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--noop] [--explain OUTDIR] [query ...]

- times each named query (default: the full BENCH_QUERIES list) with the
  SAME methodology as bench.py (df.count(), min over passes) so numbers
  are directly comparable with the frozen harness;
- ``--noop`` additionally times a noop-sink materialization (computes
  every column of every row — guide §1.4) per query;
- ``--explain OUTDIR`` writes ``<query>.txt`` with .explain("formatted")
  output per query (for plans/r06/*_before.txt / _after.txt).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from bench import BENCH_QUERIES
from cs588_data_science_bug_duplicate_detector_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes, noop, explain_dir = 1, False, None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            i += 1
            sf_dir = args[i]
        elif a == "--passes":
            i += 1
            passes = int(args[i])
        elif a == "--noop":
            noop = True
        elif a == "--explain":
            i += 1
            explain_dir = args[i]
        else:
            names.append(a)
        i += 1
    if not names:
        names = list(BENCH_QUERIES)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # same warmup contract as bench.py
    import re

    warm_dir = re.sub(r"sf[\d.]+/?$", "sf0.001", sf_dir)
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    qs["minhash_clusters_fast"](spark, warm_dir).count()
    entrymod.clear_label_cache()

    if explain_dir:
        os.makedirs(explain_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"explain written: {name}")
        entrymod.clear_label_cache()

    timings: dict[str, float] = {}
    noops: dict[str, float] = {}
    for p in range(passes):
        if p:
            entrymod.clear_label_cache()
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name} (count)")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()
            t = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, t), t)
            if noop:
                spark.sparkContext.setJobDescription(f"bench_extra: {name} (noop)")
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t = round(time.time() - t0, 3)
                noops[name] = min(noops.get(name, t), t)
            spark.sparkContext.setJobDescription(None)

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "passes": passes,
        "count_timings": timings,
        "total": round(sum(timings.values()), 3),
    }
    if noop:
        out["noop_timings"] = noops
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
