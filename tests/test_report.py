"""Corpus-level dedup reporting (operators/report.py): cluster-size
histogram and per-source duplicate concentration on a hand-built cluster
structure where every expected row is derivable by eye."""

from cs588_data_science_bug_duplicate_detector_spark.operators.report import (
    cluster_size_histogram,
    source_dup_stats,
)

# clusters: {10} {11,12} {13,14,15} {16,17,18} {19} — sizes 1,2,3,3,1
LABELS = [
    (10, 10), (11, 11), (12, 11), (13, 13), (14, 13), (15, 13),
    (16, 16), (17, 16), (18, 16), (19, 19),
]
# sources: a mirror pair split across srcA/srcB (cluster 11), a farm
# wholly inside srcA (cluster 13), srcB otherwise unique-heavy
DOCS = [
    (10, "srcA"), (11, "srcA"), (12, "srcB"), (13, "srcA"), (14, "srcA"),
    (15, "srcA"), (16, "srcB"), (17, "srcB"), (18, "srcB"), (19, "srcB"),
]


def _frames(spark):
    labels = spark.createDataFrame(LABELS, "doc_id long, cluster_id long")
    docs = spark.createDataFrame(DOCS, "doc_id long, source string")
    return labels, docs


def test_cluster_size_histogram(spark):
    labels, _ = _frames(spark)
    rows = {r["cluster_size"]: r for r in cluster_size_histogram(labels).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_clusters"] == 2 and rows[1]["n_docs"] == 2
    assert rows[2]["n_clusters"] == 1 and rows[2]["n_docs"] == 2
    assert rows[3]["n_clusters"] == 2 and rows[3]["n_docs"] == 6
    # histogram covers the corpus exactly
    assert sum(r["n_docs"] for r in rows.values()) == len(LABELS)


def test_source_dup_stats_counts_cross_source_mirrors(spark):
    labels, docs = _frames(spark)
    out = {r["source"]: r for r in source_dup_stats(labels, docs).collect()}
    a, b = out["srcA"], out["srcB"]
    # srcA: docs 10,11,13,14,15 — 11 is half of a CROSS-source mirror pair
    # (global size 2), 13-15 a wholly-local farm; only 10 is unique
    assert a["n_docs"] == 5 and a["n_dup_docs"] == 4
    assert a["n_clusters"] == 3  # {10}, {11,12}∩A, {13,14,15}
    assert a["dup_ppm"] == 4 * 1_000_000 // 5
    # srcB: docs 12,16,17,18,19 — 12 is the mirror's other half
    assert b["n_docs"] == 5 and b["n_dup_docs"] == 4
    assert b["n_clusters"] == 3  # {11,12}∩B, {16,17,18}, {19}
    assert b["dup_ppm"] == 800_000


def test_source_dup_stats_all_unique_source(spark):
    labels = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, cluster_id long")
    docs = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
    row = source_dup_stats(labels, docs).collect()[0]
    assert row["n_dup_docs"] == 0 and row["dup_ppm"] == 0 and row["n_clusters"] == 2
