"""Retrieval-quality metric kernels as one DataFrame program.

Same semantics as the reference's per-query Python loop
(``/root/reference/src/metrics.py:33-113,176-217``), re-expressed as
window functions + aggregations (SURVEY.md W1-W5, M1-M4):

- ranking: score desc, cand_id asc tie-break (deterministic)
- Recall@k: 1.0 iff any relevant candidate in the top-k (hit rate)
- MRR: 1/rank of first relevant over the FULL ranking, 0 if none
- AP@k: sum of precision-at-hit positions within top-k, divided by the
  TOTAL number of relevant candidates for the query (metrics.py:101-113)
- queries with zero relevant candidates are dropped from all means
  (metrics.py:187-189)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_candidates(pairs: DataFrame) -> DataFrame:
    """pairs(query_id, cand_id, score, is_dup) -> + rank, cum_hits, n_rel.

    Dup-less queries are dropped. ``n_rel`` is an UNORDERED window over the
    same query_id partitioning the rank window needs — so the (typically
    quadratic) ``pairs`` input is computed once and shuffled once. The
    earlier groupBy+join shape ran the upstream join twice and paid a third
    exchange to marry the counts back (the round-2 bench regression).
    """
    wq = Window.partitionBy("query_id")
    w = wq.orderBy(F.desc("score"), F.asc("cand_id"))
    hit = F.when(F.col("is_dup"), 1).otherwise(0)
    return (
        pairs.withColumn("n_rel", F.sum(hit).over(wq))
        .where(F.col("n_rel") > 0)
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum_hits", F.sum(hit).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )


def retrieval_metrics(pairs: DataFrame, k_values: tuple = (1, 5, 10, 20)) -> DataFrame:
    """One row per k: (k, recall_at_k, map_at_k, mrr, num_queries).

    One aggregation computes every k's mean at once, then ``stack`` melts
    the single row into per-k rows — the expensive upstream (typically an
    all-pairs or candidate join feeding ``pairs``) runs exactly ONCE, not
    once per k (round-1 verdict: the k-loop rebuilt the quadratic join 4x).
    """
    r = ranked_candidates(pairs)
    per_query = r.groupBy("query_id").agg(
        F.max(F.when(F.col("is_dup"), 1.0 / F.col("rank")).otherwise(0.0)).alias("rr"),
        F.first("n_rel").alias("n_rel"),
        *[
            F.max(
                F.when(F.col("is_dup") & (F.col("rank") <= k), 1.0).otherwise(0.0)
            ).alias(f"hit_{k}")
            for k in k_values
        ],
        *[
            F.sum(
                F.when(
                    F.col("is_dup") & (F.col("rank") <= k),
                    F.col("cum_hits").cast("double") / F.col("rank"),
                ).otherwise(0.0)
            ).alias(f"psum_{k}")
            for k in k_values
        ],
    )
    one = per_query.agg(
        *[F.avg(f"hit_{k}").alias(f"r_{k}") for k in k_values],
        *[F.avg(F.col(f"psum_{k}") / F.col("n_rel")).alias(f"m_{k}") for k in k_values],
        F.avg("rr").alias("mrr"),
        F.count("*").alias("num_queries"),
    )
    stacked = ", ".join(f"{k}, r_{k}, m_{k}" for k in k_values)
    return one.select(
        F.expr(f"stack({len(k_values)}, {stacked}) AS (k, recall_at_k, map_at_k)"),
        "mrr",
        "num_queries",
    )


def format_metrics_block(rows: list, k_values: tuple = (1, 5, 10, 20)) -> str:
    """Driver-side pretty block (SURVEY.md M5 ≙ MetricsCalculator.format_metrics,
    /root/reference/src/metrics.py:221-256). ``rows`` is the collected output
    of retrieval_metrics (one row per k)."""
    by_k = {int(r["k"]): r for r in rows}
    lines = ["\nRetrieval Metrics:", "=" * 50, "\nRecall@k:"]
    for k in k_values:
        if k in by_k:
            lines.append(f"  Recall@{k:2d}: {by_k[k]['recall_at_k']:.4f}")
    if by_k:
        any_row = next(iter(by_k.values()))
        lines.append(f"\nMRR: {any_row['mrr']:.4f}")
    lines.append("\nMAP@k:")
    for k in k_values:
        if k in by_k:
            lines.append(f"  MAP@{k:2d}: {by_k[k]['map_at_k']:.4f}")
    if by_k:
        lines.append(f"\nNumber of queries: {int(any_row['num_queries'])}")
    lines.append("=" * 50)
    return "\n".join(lines)


def relevance_pairs(labels: DataFrame, id_col: str = "id", cluster_col: str = "cluster_id") -> DataFrame:
    """Self equi-join on cluster id, excluding self-pairs (SURVEY.md J2/P6
    ≙ /root/reference/src/metrics.py:180-200): the ground-truth relevant
    set for each query doc."""
    a = labels.select(F.col(id_col).alias("query_id"), F.col(cluster_col).alias("c"))
    b = labels.select(F.col(id_col).alias("cand_id"), F.col(cluster_col).alias("c"))
    return a.join(b, "c").where(F.col("query_id") != F.col("cand_id")).drop("c")
