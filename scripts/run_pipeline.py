"""spark-submit entry point for the dedup pipeline.

Cluster usage (north_rule deployment shape):

    python scripts/make_pyfiles.py                 # builds dist/dupdetect.zip
    spark-submit --master <cluster> \\
        --py-files dist/dupdetect.zip \\
        scripts/run_pipeline.py \\
        --input  <pages parquet/iceberg path> \\
        --workdir <checkpoint root> \\
        --detectors exact,minhash,simhash,suffix

Local smoke:

    python scripts/run_pipeline.py --input /tmp/pages --workdir /tmp/wd
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path (parquet dir)")
    ap.add_argument("--workdir", required=True, help="checkpoint/output root")
    ap.add_argument("--detectors", default="exact,minhash,simhash,suffix")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None, help="local mode cores (ignored under a real master)")
    ap.add_argument(
        "--keep-best", action="store_true",
        help="arm the W6 keep-best gate: score labels by the fraction of "
             "docs in non-singleton clusters and only overwrite "
             "component_labels_best when the new run scores >= previous",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
    from cs588_data_science_bug_duplicate_detector_spark.plans.pipeline import run_pipeline

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing  # spark-submit provided the session/context
    else:
        from cs588_data_science_bug_duplicate_detector_spark.session import get_spark

        spark = get_spark("dedup-pipeline", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.input)

    def dup_mass(labels):
        """Default keep-best score: fraction of docs in non-singleton
        clusters (a recall-shaped proxy when no planted truth exists)."""
        from pyspark.sql import functions as F

        n = labels.count()
        multi = (
            labels.groupBy("cluster_id").count().where(F.col("count") > 1)
            .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("m"))
            .collect()[0]["m"]
        )
        return multi / max(n, 1)

    run = run_pipeline(
        spark,
        pages,
        args.workdir,
        DedupConfig(),
        detectors=tuple(args.detectors.split(",")),
        resume=not args.no_resume,
        quality_fn=dup_mass if args.keep_best else None,
    )
    n = run.labels.count()
    n_clusters = run.labels.select("cluster_id").distinct().count()
    print(json.dumps({"labels": n, "clusters": n_clusters, "stats": run.stats}))


if __name__ == "__main__":
    main()
