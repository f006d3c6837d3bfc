"""End-to-end duplicate-pair recall gate (BASELINE.md):

planted clusters -> minhash+exact edges -> CC labels; dup-pair recall
>= 0.99 vs the planted truth at the pinned shingle/signature config, and
no false merges of distractor (J~0.35) or span-only pairs.
"""

import itertools
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.datagen import generate_pages
from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import minhash_edges


def _pairs(label_map):
    clusters = defaultdict(list)
    for k, v in label_map.items():
        clusters[v].append(k)
    out = set()
    for members in clusters.values():
        out.update(itertools.combinations(sorted(members), 2))
    return out


@pytest.fixture(scope="module")
def e2e(spark):
    cfg = DedupConfig()
    pages, truth, spans = generate_pages(spark, 500, seed=42)
    pages = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    ).cache()
    edges, hot = minhash_edges(pages, "doc_id", "text", cfg)
    all_edges = edges.unionByName(exact_dup_edges(pages, "doc_id", "text")).distinct()
    labels = connected_components(all_edges, vertices=pages.select("doc_id"))
    lab = {r["id"]: r["cluster_id"] for r in labels.collect()}
    tr = {
        int(r["url"].rsplit("/p/", 1)[1]): r["true_cluster_id"]
        for r in truth.collect()
    }
    span_pairs = {
        tuple(
            sorted(
                (
                    int(r["url_a"].rsplit("/p/", 1)[1]),
                    int(r["url_b"].rsplit("/p/", 1)[1]),
                )
            )
        )
        for r in spans.collect()
    }
    return lab, tr, span_pairs, pages


def test_dup_pair_recall_gate(e2e):
    lab, tr, _, pages = e2e
    true_pairs = _pairs(tr)
    pred_pairs = _pairs(lab)
    recall = len(true_pairs & pred_pairs) / len(true_pairs)
    assert len(true_pairs) > 100
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} < 0.99"


def test_no_false_merges(e2e):
    lab, tr, span_pairs, _ = e2e
    extra = _pairs(lab) - _pairs(tr)
    # long-shared-span pairs belong to the suffix detector, distractors to
    # nothing: the minhash+exact pass must not merge either.
    assert not (extra - span_pairs), f"false merges: {sorted(extra - span_pairs)[:5]}"


def test_every_doc_labeled(e2e):
    lab, _, _, pages = e2e
    assert len(lab) == pages.count()


def test_cluster_stats_shape(e2e, spark):
    """Reference-style dataset stats (preprocess_data.py:211-224 semantics):
    counts of multi-doc clusters and singletons partition the corpus."""
    lab, _, _, pages = e2e
    labels = spark.createDataFrame(list(lab.items()), "id long, cluster_id long")
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("n"))
    row = sizes.agg(
        F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).alias("multi"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("single"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("docs_in_multi"),
        F.max("n").alias("max_size"),
    ).collect()[0]
    assert row["multi"] > 0 and row["single"] > 0
    assert row["docs_in_multi"] + row["single"] == len(lab)
    assert row["max_size"] >= 8  # the boilerplate farm
