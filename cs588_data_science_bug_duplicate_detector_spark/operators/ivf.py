"""IVF-flat approximate nearest neighbor — the second scale path for
similarity search (complement to the hyperplane-LSH buckets in ann.py).

Mirrors the reference's encode->retrieve semantics
(/root/reference/evaluate.py:71-108, src/metrics.py:259-280) like
``lsh_topk`` does, with an inverted-file index instead of hash tables:

1. choose ``n_centroids`` coarse centroids DETERMINISTICALLY — the corpus
   vectors with the smallest xxhash64(id) (seeded-sample init; a Lloyd
   refinement can be layered on with pyspark.ml KMeans when a trained
   quantizer is worth the extra pass);
2. assign every corpus vector to its nearest centroid (one Arrow-batched
   numpy matmul per batch — the inverted file is a (centroid_id, id)
   table, shuffled once);
3. each query probes its ``n_probe`` nearest centroids; candidates come
   from the equi-join on centroid_id — shuffle is linear in corpus size,
   never |Q|x|C|;
4. exact cosine rescoring + per-query top-k window, identical tie-break
   (score desc, id asc) to brute_force_topk.

A (query, neighbor) pair can match at most ONCE (each corpus vector lives
in exactly one inverted list), so no candidate dedup exchange is needed —
structurally cheaper than the multi-table LSH join. Recall is governed by
n_probe/n_centroids and is pytest-gated against brute force (>=0.8, same
gate as LSH).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from .ann import _as_double, cosine_col


def _sample_centroids(base: DataFrame, n_centroids: int, sample_hash: str) -> np.ndarray:
    """(n_centroids, dim) float64, L2-normalized. Deterministic: the rows
    with the smallest hash(id) — a seeded sample with no data-order
    dependence. ``sample_hash='md5'`` is the portable mode (DuckDB computes
    the identical md5-hex order, so the oracle rebuilds the same index).
    Driver-side collect of n_centroids vectors only."""
    key = (
        F.md5(F.col("id").cast("string"))
        if sample_hash == "md5"
        else F.xxhash64(F.col("id").cast("string"))
    )
    rows = (
        base.select("id", "vec")
        .orderBy(key, F.col("id"))
        .limit(n_centroids)
        .collect()
    )
    cents = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in rows])
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def _nearest_centroids_udf(cents: np.ndarray, n_probe: int):
    """array<int> of the n_probe nearest centroid ids (cosine)."""

    def probe(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cents.T
        # argsort desc, ties broken by centroid id asc (stable on -sims)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    return pandas_udf(probe, ArrayType(IntegerType()))


def ivf_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 64,
    n_probe: int = 4,
    queries: DataFrame | None = None,
    sample_hash: str = "xxhash64",
) -> DataFrame:
    """(query_id, rank, neighbor_id, score): IVF-flat approximate top-k.

    ``queries`` (like brute_force_topk/lsh_topk) restricts the probe side
    BEFORE the inverted-list join and is broadcast when given.
    """
    base = _as_double(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec"
    )
    cents = _sample_centroids(base, n_centroids, sample_hash)
    assign = _nearest_centroids_udf(cents, 1)
    probe = _nearest_centroids_udf(cents, n_probe)

    # inverted file: every corpus vector in exactly one list
    inv = base.select(
        F.col("id").alias("nid"),
        F.col("vec").alias("nvec"),
        F.element_at(assign(F.col("vec")), 1).alias("cid"),
    )
    qbase = (
        _as_double(queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec")
        if queries is not None
        else base
    )
    qprobe = qbase.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.explode(probe(F.col("vec"))).alias("cid"),
    )
    if queries is not None:
        qprobe = F.broadcast(qprobe)
    cand = (
        qprobe.join(inv, "cid")
        .where(F.col("query_id") != F.col("nid"))
        .withColumn("score", cosine_col(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("nid").alias("neighbor_id"), "score")
    )
