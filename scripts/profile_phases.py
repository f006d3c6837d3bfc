"""Per-phase scaling profile: time each dedup sub-phase separately at one
core count (pin externally with taskset). Diff two runs (e.g. 2 vs 8
cores) to find the phases whose constants don't parallelize.

Usage: taskset -c 0-1 python scripts/profile_phases.py --cores 2 [--docs 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_scaling import CORPUS, ensure_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--docs", type=int, default=400_000)
    args = ap.parse_args()
    ensure_corpus(args.docs)

    from pyspark.sql import functions as F

    from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
    from cs588_data_science_bug_duplicate_detector_spark.operators import minhash as mh
    from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
    from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
    from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import (
        simhash_edges_from_sigs,
    )
    from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

    cfg = DedupConfig()
    spark = get_spark("phase-prof", cores=args.cores, shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    t: dict[str, float] = {}

    def phase(name):
        class _P:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                t[name] = round(time.time() - self.t0, 2)
                print(f"PHASE {name}: {t[name]}", flush=True)

        return _P()

    docs = (
        spark.read.parquet(CORPUS)
        .select(F.xxhash64("url").alias("doc_id"), "text")
        .repartition(2 * args.cores)
        .persist()
    )
    with phase("read_docs"):
        docs.count()
    with phase("sign"):
        # the production shape: ONE Arrow pass, shared tokenize + token hash
        from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import (
            with_dual_signatures,
        )

        sigs = with_dual_signatures(docs, "text", cfg).drop("text").persist()
        sigs.count()
    with phase("minhash_detect"):
        mh_edges, _hot = mh.minhash_edges_from_sigs(
            sigs.select("doc_id", "minhash"), "doc_id", cfg
        )
        mh_edges = mh_edges.persist()
        mh_edges.count()
    with phase("simhash_detect"):
        sh = simhash_edges_from_sigs(sigs.select("doc_id", "simhash"), "doc_id", cfg).persist()
        sh.count()
    with phase("exact_detect"):
        ex = exact_dup_edges(docs, "doc_id", "text").persist()
        ex.count()
    with phase("union_distinct"):
        edges = mh_edges.unionByName(sh).unionByName(ex).distinct().persist()
        n_edges = edges.count()
    rounds: list[float] = []
    t0 = time.time()
    last = [t0]

    def on_it(i, n):
        now = time.time()
        rounds.append(round(now - last[0], 2))
        last[0] = now

    with phase("cc"):
        labels = connected_components(
            edges, vertices=docs.select("doc_id"), on_iteration=on_it, pre_deduped=True
        )
        n_labels = labels.count()
    t["cc_rounds"] = rounds
    t["edges"] = n_edges
    t["labels"] = n_labels
    t["cores"] = args.cores
    print("RESULT " + json.dumps(t), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
