"""Two-parallelism scaling evidence (north_rule stand-in for N vs 4N
executors): run the identical dedup job on the identical corpus at
local[8] and local[32], report docs/sec at both and efficiency
(T_8/T_32)/4. Results land in BENCH/BASELINE.md.

Usage:
  python scripts/bench_scaling.py --all [--docs 100000]   # orchestrates both
  python scripts/bench_scaling.py --cores 8               # one measurement
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/dupdetect_scale_corpus"


def ensure_corpus(n_docs: int) -> None:
    marker = os.path.join(CORPUS, f"_GEN_{n_docs}")
    if os.path.exists(marker):
        return
    from cs588_data_science_bug_duplicate_detector_spark.datagen import generate_pages_distributed
    from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

    spark = get_spark("scale-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    # lean corpus: the dedup job reads (url, text, lang) only
    generate_pages_distributed(spark, n_docs).select("url", "text", "lang").write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()
    # overwrite mode already wiped the directory (stale markers included)
    open(marker, "w").close()


def run_once(cores: int, corpus: str = CORPUS) -> dict:
    from pyspark.sql import functions as F

    from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
    from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
    from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
    from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import (
        minhash_edges_from_sigs,
        with_dual_signatures,
    )
    from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import simhash_edges_from_sigs
    from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

    cfg = DedupConfig()
    spark = get_spark("scale-bench", cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    # no repartition: the corpus files already split evenly (maxPartitionBytes)
    # and a hash exchange of the full text payload is the worst-scaling op on
    # this host (see BENCH/BASELINE.md shuffle microbenchmark)
    docs = (
        spark.read.parquet(corpus)
        .select(F.xxhash64("url").alias("doc_id"), "text")
        .persist()
    )
    # staged shape (same as plans/pipeline.py): signatures are computed ONCE
    # and shared by every detector — composing the detector functions directly
    # would re-evaluate the signature UDFs in each self-join branch.
    t0 = time.time()
    if os.environ.get("SIGN_MODE") == "chained":
        from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import with_minhash
        from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import with_simhash

        sigs = with_simhash(with_minhash(docs, "text", cfg), "text").drop("text").persist()
    else:
        sigs = with_dual_signatures(docs, "text", cfg).drop("text").persist()
    sigs.count()
    t_sign = time.time() - t0
    mh, _hot = minhash_edges_from_sigs(sigs.select("doc_id", "minhash"), "doc_id", cfg)
    edges = (
        mh.unionByName(exact_dup_edges(docs, "doc_id", "text"))
        .unionByName(simhash_edges_from_sigs(sigs.select("doc_id", "simhash"), "doc_id", cfg))
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    t_detect = time.time() - t0
    # edges are already distinct + persisted: skip CC's internal dedup shuffle
    labels = connected_components(edges, vertices=docs.select("doc_id"), pre_deduped=True)
    n_labels = labels.count()
    sizes_df = labels.groupBy("cluster_id").count()
    n_clusters = sizes_df.count()
    max_cluster = sizes_df.agg(F.max("count")).collect()[0][0]
    sec = time.time() - t0
    t_cc = sec - t_detect
    n_docs = spark.read.parquet(corpus).count()  # separate lineage, after timing
    spark.stop()
    return {
        "cores": cores,
        "sec": round(sec, 2),
        "sign_sec": round(t_sign, 2),
        "detect_sec": round(t_detect, 2),
        "cc_sec": round(t_cc, 2),
        "docs": n_docs,
        "edges": n_edges,
        "docs_per_sec": round(n_docs / sec, 1),
        "labels": n_labels,
        "clusters": n_clusters,
        "max_cluster": int(max_cluster) if max_cluster is not None else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cores", type=int)
    ap.add_argument("--docs", type=int, default=400_000)
    # N vs 4N parallelism levels. Default 2 vs 8: this sandbox's 32 "CPUs"
    # are SMT vCPUs — a pure-numpy burn test shows only ~1.5x more total
    # compute from 8->32 workers (memory-bandwidth ceiling), so 8 vs 32
    # cannot exhibit software scaling. 2 vs 8 sits in the box's linear
    # region and is the honest stand-in for N vs 4N executors.
    ap.add_argument("--levels", default="2,8")
    # shared-host noise: identical legs vary +-40% run to run; min-of-R is
    # the standard robust estimator
    ap.add_argument("--repeats", type=int, default=2)
    # paired mode: run (N, 4N) back-to-back per round and report the MEDIAN
    # of per-pair ratios — adjacent legs see similar host conditions, so the
    # ratio is far less biased than min-of-independent-samples when
    # co-tenant load drifts over minutes
    ap.add_argument("--paired", type=int, default=0, help="number of adjacent (N,4N) pairs")
    ap.add_argument(
        "--out",
        default="BENCH/scaling_paired.json",
        help="paired-mode summary path (so a 3M-doc campaign doesn't clobber the 1M record)",
    )
    args = ap.parse_args()

    if args.cores:
        ensure_corpus(args.docs)
        print("RESULT " + json.dumps(run_once(args.cores)))
        return

    ensure_corpus(args.docs)
    levels = tuple(int(x) for x in args.levels.split(","))
    assert len(levels) == 2 and levels[1] == 4 * levels[0], "levels must be N,4N"
    results = {}
    have_taskset = subprocess.run(["which", "taskset"], capture_output=True).returncode == 0

    def run_pinned(cores: int) -> dict:
        prefix = ["taskset", "-c", f"0-{cores - 1}"] if have_taskset else []
        env = dict(os.environ)
        # 8g heap is borderline at 3M docs (observed: pair-2 legs OOMing in
        # the CC count while pair-1 legs squeak through — persisted sigs +
        # band table + localCheckpoint blocks). Scale the local-mode heap
        # with the corpus unless the caller pinned it.
        env.setdefault("SPARK_DRIVER_MEM", "16g" if args.docs >= 2_000_000 else "8g")
        proc = subprocess.run(
            prefix + [sys.executable, __file__, "--cores", str(cores), "--docs", str(args.docs)],
            capture_output=True, text=True, env=env,
        )
        if proc.returncode != 0:
            # surface the child's failure — a swallowed stderr cost a 40-min
            # unattended 3M-doc run its second pair with zero diagnostics
            sys.stderr.write(f"--- child (cores={cores}) rc={proc.returncode} stderr tail ---\n")
            sys.stderr.write(proc.stderr[-4000:] + "\n")
            raise RuntimeError(f"leg cores={cores} failed rc={proc.returncode}")
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
        return json.loads(line[len("RESULT "):])

    if args.paired:
        pairs = []
        for i in range(args.paired):
            # alternate leg order per pair: monotone host drift inflates the
            # ratio when it speeds the SECOND leg and deflates it when it
            # slows it — alternating cancels the direction across pairs
            # (round-5 data point: one pair read 0.397 purely because its lo
            # leg caught a fast phase its hi leg missed)
            try:
                if i % 2 == 0:
                    hi = run_pinned(levels[1])
                    lo = run_pinned(levels[0])
                else:
                    lo = run_pinned(levels[0])
                    hi = run_pinned(levels[1])
            except RuntimeError as e:
                # a failed leg voids the pair, not the whole campaign: later
                # pairs still produce usable ratios (unattended multi-hour runs)
                print(json.dumps({"pair": i, "error": str(e)}), flush=True)
                continue
            pairs.append({
                "lo_sec": lo["sec"], "hi_sec": hi["sec"],
                "efficiency": round(lo["sec"] / hi["sec"] / 4.0, 3),
            })
            print(json.dumps(pairs[-1]), flush=True)
        if not pairs:
            raise SystemExit("every pair failed — see stderr above")
        effs = sorted(p["efficiency"] for p in pairs)
        # bootstrap CI on the median of pair efficiencies: the pair ratios
        # are i.i.d.-ish across rounds (adjacent legs share host drift, the
        # rounds don't), so resampling rounds is the right unit
        import random

        rng = random.Random(0)
        boots = sorted(
            sorted(rng.choices(effs, k=len(effs)))[len(effs) // 2]
            for _ in range(10_000)
        )
        summary = {
            "docs": args.docs,
            "pairs": pairs,
            "median_pair_efficiency": effs[len(effs) // 2],
            "best_pair_efficiency": effs[-1],
            "median_ci90": [boots[500], boots[9499]],
        }
        os.makedirs("BENCH", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary))
        return
    for cores in levels:
        # pin CPU affinity: local[N] alone doesn't bound CPUs — Python UDF
        # workers run on extra cores, silently inflating the low-N run.
        prefix = ["taskset", "-c", f"0-{cores - 1}"] if have_taskset else []
        best = None
        for _ in range(max(1, args.repeats)):
            proc = subprocess.run(
                prefix
                + [sys.executable, __file__, "--cores", str(cores), "--docs", str(args.docs)],
                capture_output=True,
                text=True,
                check=True,
            )
            line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
            run = json.loads(line[len("RESULT "):])
            print(run)
            if best is None or run["sec"] < best["sec"]:
                best = run
        results[cores] = best

    lo, hi = results[levels[0]], results[levels[1]]
    eff = (lo["sec"] / hi["sec"]) / 4.0
    summary = {
        "docs": lo["docs"],
        f"local{levels[0]}": lo,
        f"local{levels[1]}": hi,
        "speedup_N_to_4N": round(lo["sec"] / hi["sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "consistent_output": lo["labels"] == hi["labels"] and lo["clusters"] == hi["clusters"],
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
