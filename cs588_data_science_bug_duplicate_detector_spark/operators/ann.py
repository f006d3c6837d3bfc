"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the reference's encode->matmul->argsort retrieval
(/root/reference/evaluate.py:71-108 + src/metrics.py:259-280,196) without
ever materializing a similarity matrix:

- ``brute_force_topk``: exact top-k by cosine; the (small) query side is
  broadcast, the corpus streams — correctness baseline and fine whenever
  |queries| * |corpus| work fits the cluster.
- ``lsh_topk``: random-hyperplane signatures bucket the corpus; candidates
  come from an equi-join on bucket id (multi-probe via table replication),
  then exact cosine rescoring within buckets. The scale path: shuffle is
  linear in corpus size, not |Q|x|C|.

Dot products run JVM-side via zip_with/aggregate on double arrays — no
Python in the scoring loop. Hyperplanes are seeded (deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a, b):
    """Cosine similarity between two array<double> columns (JVM expression)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id, score): exact cosine top-k per query.

    ``queries`` defaults to all vectors; self-matches are excluded
    (reference P6 self-exclusion, src/metrics.py:197-200).
    """
    corpus = _as_double(vectors.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")), "nvec")
    q = queries if queries is not None else vectors
    q = _as_double(q.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")), "qvec")
    scored = (
        corpus.join(F.broadcast(q), F.col("nid") != F.col("query_id"))
        .withColumn("score", cosine_col(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("nid").alias("neighbor_id"), "score")
    )


def hyperplane_udf(dim: int, n_bits: int, seed: int = 42):
    """Bucket id from signs of dot products with seeded random hyperplanes."""

    def _bucket(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_bits))
        mat = np.stack(vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_list())
        bits = (mat @ planes) > 0
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        return pd.Series(bits @ weights)

    return pandas_udf(_bucket, IntegerType())


def _bucket_tables(df: DataFrame, dim: int, n_bits: int, n_tables: int, seed: int) -> DataFrame:
    """(id, bucket, table_id) across all hash tables — ids only, vectors are
    NOT carried into the bucket join (they rejoin for the rescore)."""
    tables = []
    for t in range(n_tables):
        udf = hyperplane_udf(dim, n_bits, seed + t)
        tables.append(
            df.select("id", udf(F.col("vec")).alias("bucket")).withColumn(
                "table_id", F.lit(t)
            )
        )
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out


def lsh_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket in >=1 of
    ``n_tables`` independent tables, rescored exactly within buckets.

    ``queries`` (like ``brute_force_topk``) restricts the probe side BEFORE
    the bucket join — a 50-query lookup does 50 queries' worth of work, not
    an all-corpus ANN build. The small probe side is broadcast. Candidate
    (query_id, nid) pairs are deduped as bare ids; vectors join back only
    for the exact rescore, so the dedup exchange never carries array payloads
    (at dim=384 float64 that is ~6 KB/row of avoided shuffle).
    """
    dim_row = vectors.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    base = _as_double(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec"
    )
    buckets = _bucket_tables(base, dim, n_bits, n_tables, seed)
    if queries is not None:
        qbase = _as_double(
            queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")),
            "vec",
        )
        probe = F.broadcast(_bucket_tables(qbase, dim, n_bits, n_tables, seed))
    else:
        qbase = base
        probe = buckets
    pairs = (
        probe.alias("a")
        .join(buckets.alias("b"), ["table_id", "bucket"])
        .where(F.col("a.id") != F.col("b.id"))
        .select(F.col("a.id").alias("query_id"), F.col("b.id").alias("nid"))
        .dropDuplicates(["query_id", "nid"])
    )
    qv = qbase.select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
    nv = base.select(F.col("id").alias("nid"), F.col("vec").alias("nvec"))
    if queries is not None:
        qv = F.broadcast(qv)
    cand = (
        pairs.join(qv, "query_id")
        .join(nv, "nid")
        .withColumn("score", cosine_col(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("nid").alias("neighbor_id"), "score")
    )
