"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "docs_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

BENCH_QUERIES = [
    "minhash_clusters_fast",  # PRODUCTION flagship: siphash kernel -> LSH -> verify -> CC
    "minhash_clusters",      # portable (oracle-checkable md5) twin of the flagship
    "simhash_candidates",
    "simhash_candidates_fast",
    "suffix_span_edges",
    "suffix_span_edges_fast",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "retrieval_metrics",
    "docs_by_source_list",
    "events_rolling",
    "events_rollup",
    "embedding_knn",
    "pricing_summary",
    "events_hourly",
    "token_stats_by_lang",
    "top_docs_per_lang",
    "active_customers_by_nation",
    "lang_guess_counts",
    # round 2 additions
    "ann_lsh_topk",
    "embedding_dup_pairs",
    "quality_scores",
    # round 3 additions
    "ann_ivf_topk",
    "dedup_corpus",
    # round 4: all-corpus ANN build with the hot-bucket candidate cap
    "ann_lsh_topk_allcorpus",
    # round 5: real-codec multimodal decode + md5 media-dedup (mapInPandas)
    "media_dedup",
    # round 5: corpus-level rollups (reuse the flagship's session-cached
    # labels within a pass, like dedup_corpus — they price the report ops)
    "dedup_report",
    "source_dup_stats",
    # round 5: PII masking (pure-Catalyst regexp chain over full doc text)
    "pii_scrub",
    # round 5: Gopher quality rules (array lambdas over one tokenization)
    "gopher_quality",
    # round 5: benchmark decontamination (13-gram broadcast overlap)
    "decontamination",
    # round 5: crawl-text normalization (ordered regexp chain, full text)
    "clean_text_docs",
    # round 5: deterministic hash split + bounded-duplication policy
    "corpus_split",
    "dedup_keep2",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # one untimed warmup at the smallest sf: spins up Python UDF workers,
    # populates codegen/parquet-reader caches. The first timed query
    # otherwise pays 5-10s of JVM cold-start that isn't the query's cost
    # (measured: flagship 11.3s cold vs 4.8s warm on an idle box). Only the
    # trailing sf segment is rewritten (a blanket replace corrupted paths
    # like /data0.1/sf0.1), falling back to sf_dir itself when no sibling
    # sf0.001 dataset exists.
    warm_dir = re.sub(r"sf[\d.]+/?$", "sf0.001", sf_dir)
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    qs["minhash_clusters_fast"](spark, warm_dir).count()
    # the warmup populated __spark_entry__._LABEL_CACHE for (spark, warm_dir,
    # 'fast'); when no sibling sf0.001 exists warm_dir == sf_dir and the first
    # TIMED flagship query would measure a cache hit, not the kernel. Evict
    # (and unpersist — a bare clear() strands the localCheckpoint blocks on
    # the executors) so every timed query pays its own full cost.
    entrymod.clear_label_cache()

    # Per-query MIN over independent passes: this box is a shared-host VM
    # where identical runs vary ±40% (BENCH/BASELINE.md), and a single pass
    # makes round-over-round totals track host contention, not the code.
    # The min is the run least perturbed by neighbors — the estimator
    # scripts/bench_scaling.py already uses. The label cache is cleared
    # between passes so every pass prices the flagship kernel itself
    # (within a pass, dedup_corpus intentionally reuses the flagship's
    # session-cached labels — same semantics as a real pipeline run).
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for p in range(passes):
        if p:
            entrymod.clear_label_cache()
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()  # materialize the full plan
            t = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, t), t)

    total = round(sum(timings.values()), 3)
    # headline throughput tracks the production kernel, not the md5 oracle twin
    flagship = timings["minhash_clusters_fast"]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(n_docs / flagship, 1) if flagship else None,
        "cpus": cpus,
        "passes": passes,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
