"""Corpus-level dedup reporting: cluster-size histogram + per-source
duplicate concentration.

Every production dedup run ends with the same two questions — "how much
of the corpus is duplicated, at what cluster sizes?" and "which sources
contribute the duplicates?" (hot mirrors / boilerplate farms dominate
real crawls). The reference prints per-query duplicate inspections only
(`duplicate_detector.py`'s report loop); these operators are the
corpus-level rollups a 10^12-doc run needs, and they are pure Catalyst
two-level aggregations — no windows over the full corpus, no driver
collection.

Scale notes:
- `cluster_size_histogram` is two map-side-combinable groupBys; the
  second one's input is one row per cluster, output one row per distinct
  size (~log-many rows).
- `source_dup_stats` pre-aggregates per (source, cluster) BEFORE the
  per-source rollup, so the distinct-cluster count never builds a
  count-distinct expand over raw docs; cluster size reaches each doc via
  an aggregate-then-join on cluster_id (both sides shuffle-partitioned by
  the same key), not a full-corpus window.
- fractions are reported as exact integer parts-per-million (``*1e6 DIV
  n``) so results are bit-stable across engines (no float rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_size_histogram(labels: DataFrame, cluster_col: str = "cluster_id") -> DataFrame:
    """(cluster_size, n_clusters, n_docs) — one row per distinct cluster
    size. ``n_docs = cluster_size * n_clusters`` is derived, not a third
    aggregation pass. ``cluster_size == 1`` rows are the unique docs."""
    sizes = labels.groupBy(cluster_col).agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .withColumn("n_docs", F.col("cluster_size") * F.col("n_clusters"))
    )


def source_dup_stats(
    labels: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Per-source duplicate concentration:

    - ``n_docs``: docs from this source;
    - ``n_dup_docs``: of those, docs in a cluster of GLOBAL size > 1
      (cross-source duplicates count — a mirror's copies are dups even if
      each source holds one);
    - ``n_clusters``: distinct clusters with >= 1 member in this source;
    - ``dup_ppm``: ``n_dup_docs * 1_000_000 DIV n_docs`` (exact integer).
    """
    sizes = labels.groupBy(cluster_col).agg(F.count("*").alias("_sz"))
    per_doc = (
        labels.join(sizes, cluster_col)
        .join(docs.select(id_col, source_col), id_col)
    )
    per_source_cluster = per_doc.groupBy(source_col, cluster_col).agg(
        F.count("*").alias("_n"),
        F.max("_sz").alias("_sz"),  # _sz is cluster-constant
    )
    return (
        per_source_cluster.groupBy(source_col)
        .agg(
            F.sum("_n").alias("n_docs"),
            F.sum(F.when(F.col("_sz") > 1, F.col("_n")).otherwise(F.lit(0))).alias(
                "n_dup_docs"
            ),
            F.count("*").alias("n_clusters"),
        )
        .withColumn("dup_ppm", F.expr("CAST(n_dup_docs * 1000000 DIV n_docs AS BIGINT)"))
    )
