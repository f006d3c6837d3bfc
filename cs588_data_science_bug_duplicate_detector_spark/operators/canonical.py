"""Canonical-representative selection: labels -> the deduped corpus.

The last step a training-data pipeline actually consumes: given cluster
labels, keep ONE representative per cluster (richest text wins — longest
extracted text, doc_id as the deterministic tie-break) and emit the
surviving corpus plus per-cluster bookkeeping. ≙ the reference keeping
one row per duplicate_cluster_id when building its processed dataset
(/root/reference/preprocess_data.py:187-214).

Scale shape: one broadcast-free equi-join docs⋈labels on doc_id (both
sides already keyed and, after the pipeline, co-written by the same job)
and ONE window over cluster_id — no groupBy+join-back, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_docs(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """One row per cluster: (cluster_id, doc_id, <length_col>, n_members).

    The representative maximizes ``length_col`` (ties -> min id). Clusters
    of size 1 pass through unchanged, so the output IS the deduped corpus
    keyed by its surviving doc.

    Delegates to :func:`sample_per_cluster` with k=1 so the two policies
    can never diverge on ranking or tie-break.
    """
    return sample_per_cluster(
        docs, labels, 1, id_col=id_col, cluster_col=cluster_col, length_col=length_col
    ).drop("rank")


def sample_per_cluster(
    docs: DataFrame,
    labels: DataFrame,
    k: int,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Up to ``k`` representatives per cluster (``canonical_docs`` is the
    k=1 policy): (cluster_id, doc_id, <length_col>, n_members, rank).

    Real pipelines don't always hard-dedup — RefinedWeb-style recipes keep
    a bounded number of near-copies so naturally-frequent pages stay
    upweighted without letting a mirror farm dominate. Ranking matches
    ``canonical_docs`` exactly (longest text, min-id tie-break), so
    ``rank == 1`` rows ARE the canonical corpus. Same plan shape: one
    equi-join + one window pass, no groupBy round trip."""
    joined = docs.select(id_col, length_col).join(
        labels.select(id_col, cluster_col), id_col
    )
    w = Window.partitionBy(cluster_col)
    ranked = (
        joined.withColumn("_n", F.count("*").over(w))
        .withColumn(
            "_rk",
            F.row_number().over(w.orderBy(F.desc(length_col), F.asc(id_col))),
        )
    )
    return (
        ranked.where(F.col("_rk") <= k)
        .select(
            cluster_col,
            id_col,
            length_col,
            F.col("_n").cast("long").alias("n_members"),
            F.col("_rk").cast("long").alias("rank"),
        )
    )
