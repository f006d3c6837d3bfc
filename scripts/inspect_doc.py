"""Single-doc duplicate inspection CLI (≙ the reference's
inference_comparison.py entry point: top-k candidates with ✓ DUPLICATE
truth marks).

Usage:
    python scripts/inspect_doc.py <corpus.parquet> <doc_id> [k] [--labels labels.parquet]

The corpus parquet needs (doc_id, text); labels (optional) needs
(doc_id|id, cluster_id) — e.g. a component_labels pipeline checkpoint —
and provides the truth marks.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.operators.inspect import inspect_doc
from cs588_data_science_bug_duplicate_detector_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("corpus")
    p.add_argument("doc_id", type=int)
    p.add_argument("k", nargs="?", type=int, default=20)
    p.add_argument("--labels", default=None)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    args = p.parse_args()

    spark = get_spark("inspect-doc", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.corpus)
    labels = spark.read.parquet(args.labels) if args.labels else None
    print(
        inspect_doc(
            docs, args.id_col, args.text_col, args.doc_id,
            DedupConfig(), args.k, labels=labels,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
