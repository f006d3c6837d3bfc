"""Incremental-vs-recompute benchmark (operators/incremental.py).

The scale claim under test: folding a new crawl increment into an
existing DedupIndex must cost ~O(|increment|) signature work plus
touched-bucket joins — NOT a re-run of the whole corpus. This script
measures, on one session and one corpus:

  1. base index build        (increment 0 = ~91% of the corpus)
  2. incremental fold        (increment 1 = ~9%, spread by doc_id % 11
                              so planted dup clusters cross the split)
  3. full from-scratch batch (exact ∪ MinHash ∪ SimHash -> CC on 100%,
     the same detector set bench_scaling.py times)

and asserts the fold's final labels describe the same corpus (label and
cluster counts equal to the batch run — full row equality is the
oracle-checked `incremental_dedup` driver query's job at sf0.01).

Usage: python scripts/bench_incremental.py [--docs 1000000] [--cores 32]
Prints ONE JSON line; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import CORPUS, ensure_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    # increment fraction ~ 1/split_mod of the corpus (11 -> ~9%, 101 -> ~1%)
    ap.add_argument("--split-mod", type=int, default=11)
    args = ap.parse_args()

    ensure_corpus(args.docs)

    from pyspark.sql import functions as F

    from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
    from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
    from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
    from cs588_data_science_bug_duplicate_detector_spark.operators.incremental import DedupIndex
    from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import (
        minhash_edges,
        release_cached_deps,
    )
    from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import simhash_edges
    from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

    cfg = DedupConfig()
    spark = get_spark("bench-incremental", cores=args.cores,
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    # same id scheme as bench_scaling: content-address by url hash
    docs = spark.read.parquet(CORPUS).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    inc_docs = docs.where(F.pmod(F.col("doc_id"), F.lit(args.split_mod)) == 0)
    base_docs = docs.where(F.pmod(F.col("doc_id"), F.lit(args.split_mod)) != 0)

    tmp = tempfile.mkdtemp(prefix="bench_inc_")
    try:
        idx = DedupIndex(f"{tmp}/idx", cfg)

        t0 = time.monotonic()
        idx.add_increment(base_docs, "doc_id", "text")
        base_s = time.monotonic() - t0

        t0 = time.monotonic()
        inc_labels = idx.add_increment(inc_docs, "doc_id", "text")
        inc_s = time.monotonic() - t0

        t0 = time.monotonic()
        edges, _hot = minhash_edges(docs, "doc_id", "text", cfg)
        sim = simhash_edges(docs, "doc_id", "text", cfg)
        batch_edges = (
            edges.unionByName(exact_dup_edges(docs, "doc_id", "text"))
            .unionByName(sim)
            .distinct()
        )
        batch_labels = connected_components(
            batch_edges, vertices=docs.select("doc_id"), pre_deduped=True
        )
        n_full, k_full = (
            batch_labels.agg(
                F.count("*"), F.countDistinct("cluster_id")
            ).collect()[0]
        )
        full_s = time.monotonic() - t0
        release_cached_deps(edges)
        release_cached_deps(sim)

        n_inc, k_inc = (
            inc_labels.agg(F.count("*"), F.countDistinct("cluster_id")).collect()[0]
        )
        assert (n_inc, k_inc) == (n_full, k_full), (
            f"incremental ({n_inc},{k_inc}) != batch ({n_full},{k_full})"
        )
        n_new = inc_docs.count()
        print(json.dumps({
            "metric": "incremental_fold_vs_full_recompute",
            "docs_total": int(n_inc),
            "docs_in_increment": int(n_new),
            "clusters": int(k_inc),
            "base_build_sec": round(base_s, 1),
            "incremental_fold_sec": round(inc_s, 1),
            "full_recompute_sec": round(full_s, 1),
            "fold_speedup_vs_recompute": round(full_s / inc_s, 2),
            "cores": args.cores,
            "split_mod": args.split_mod,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
