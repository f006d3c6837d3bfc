"""Reference-parity preprocessing: cluster partitions must match an
in-process union-find with the reference's parse/edge semantics, and the
4-column output must have the reference's augmentation shape
(FIXTURES.md §4)."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.operators.cc import union_find_oracle
from cs588_data_science_bug_duplicate_detector_spark.plans.bug_reports import (
    cluster_assignments,
    dataset_stats,
    preprocess_split,
)
from cs588_data_science_bug_duplicate_detector_spark.sources.readers import (
    BUG_REPORTS_DDL,
    SPLIT_DDL,
)

RAW = [
    # Issue_id, Product, Component, Op_sys, Priority, Title, Description, Enhanced, Duplicate
    (1, "Firefox", "UI", "Linux", "P1", "Crash", "It crashes", "It crashes [img]", "2;3"),
    (2, "Firefox", "UI", None, "P2", "Crash again", "Dup of 1", None, "NULL"),
    (3, "Firefox", None, "Mac", None, "Crash 3", "Also dup", "Also dup [img]", ""),
    (4, "Core", "DOM", "Win", "P3", "Leak", "Memory leak", "Memory leak vis", "5"),
    (5, "Core", "DOM", "Win", "P3", "Leak dup", "Leak copy", None, "4;999"),  # 999 unknown
    (6, "Core", "JS", "Win", "P2", "Solo", "Independent", "Independent", None),
    (7, "Mail", "IMAP", "Win", "P1", "Other split", "Excluded", None, "1"),  # not in split
]
SPLIT = [(i, r[8]) for i, r in zip((1, 2, 3, 4, 5, 6), RAW[:6])]


def _dfs(spark):
    raw = spark.createDataFrame(RAW, BUG_REPORTS_DDL)
    split = spark.createDataFrame(SPLIT, SPLIT_DDL)
    return raw, split


def _parse_ref(dup):
    """Reference parse semantics (preprocess_data.py:68-90)."""
    out = set()
    if dup is None:
        return out
    for tok in str(dup).split(";"):
        tok = tok.strip()
        if not tok or tok.upper() == "NULL":
            continue
        try:
            out.add(int(tok))
        except ValueError:
            pass
    return out


def test_cluster_partitions_match_union_find(spark):
    raw, split = _dfs(spark)
    got = {
        r["issue_id"]: r["duplicate_cluster_id"]
        for r in cluster_assignments(split).collect()
    }
    known = {i for i, _ in SPLIT}
    edges = []
    for i, dup in SPLIT:
        for d in _parse_ref(dup):
            if d in known:  # preprocess_data.py:131-134
                edges.append((i, d))
    oracle = union_find_oracle(edges, sorted(known))
    # compare PARTITIONS (root choice differs: reference uses union order root)
    def parts(m):
        p = defaultdict(set)
        for k, v in m.items():
            p[v].add(k)
        return {frozenset(v) for v in p.values()}

    assert parts(got) == parts(oracle)
    assert parts(got) == {frozenset({1, 2, 3}), frozenset({4, 5}), frozenset({6})}


def test_processed_output_shape_and_augmentation(spark):
    raw, split = _dfs(spark)
    out = preprocess_split(raw, split)
    assert out.columns == [
        "bug_id",
        "duplicate_cluster_id",
        "augmented_text_with_vlm",
        "augmented_text_without_vlm",
    ]
    rows = {r["bug_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}  # report 7 excluded by semi-join
    assert rows[1]["augmented_text_without_vlm"] == (
        "[PRODUCT] Firefox\n[COMPONENT] UI\n[OS] Linux\n[PRIORITY] P1\n"
        "[SUMMARY] Crash\n[DESCRIPTION] It crashes"
    )
    # Enhanced_Description feeds the with_vlm variant; nulls skipped
    assert rows[2]["augmented_text_with_vlm"] == (
        "[PRODUCT] Firefox\n[COMPONENT] UI\n[PRIORITY] P2\n[SUMMARY] Crash again"
    )
    assert "[DESCRIPTION] It crashes [img]" in rows[1]["augmented_text_with_vlm"]


def test_dataset_stats(spark):
    raw, split = _dfs(spark)
    stats = dataset_stats(preprocess_split(raw, split))
    assert stats["total_reports"] == 6
    assert stats["clusters_multi"] == 2
    assert stats["singletons"] == 1
    assert stats["reports_in_multi"] == 5
    assert stats["max_cluster_size"] == 3
