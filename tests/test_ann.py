"""Similarity search: brute-force exact top-k vs numpy; LSH recall vs brute."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.operators.ann import (
    brute_force_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    # clustered vectors so LSH has structure to find
    centers = rng.standard_normal((8, 32))
    rows = []
    for i in range(200):
        c = centers[i % 8]
        v = c + 0.15 * rng.standard_normal(32)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def _numpy_topk(rows, k):
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    out = {}
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )
        out[int(ids[i])] = [int(ids[j]) for j in order[:k]]
    return out


def test_brute_force_matches_numpy(spark, vectors):
    df, rows = vectors
    got = {}
    res = brute_force_topk(df, "vec_id", "embedding", k=5)
    for r in res.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    want = _numpy_topk(rows, 5)
    assert set(got) == set(want)
    for q in want:
        assert [n for _, n in sorted(got[q])] == want[q]


def test_lsh_recall_vs_brute(spark, vectors):
    df, rows = vectors
    want = _numpy_topk(rows, 5)
    res = lsh_topk(df, "vec_id", "embedding", k=5, n_bits=8, n_tables=6)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, neighbors in want.items():
        total += len(neighbors)
        hits += len(set(neighbors) & got.get(q, set()))
    assert hits / total >= 0.8  # approximate path: high-but-not-perfect recall


def test_ivf_recall_vs_brute(spark, vectors):
    from cs588_data_science_bug_duplicate_detector_spark.operators.ivf import ivf_topk

    df, rows = vectors
    want = _numpy_topk(rows, 5)
    res = ivf_topk(df, "vec_id", "embedding", k=5, n_centroids=16, n_probe=6)
    got = {}
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q, neighbors in want.items():
        total += len(neighbors)
        hits += len(set(neighbors) & got.get(q, set()))
    assert hits / total >= 0.8  # same gate as LSH


def test_ivf_queries_param_restricts_probe_side(spark, vectors):
    from cs588_data_science_bug_duplicate_detector_spark.operators.ivf import ivf_topk

    df, _ = vectors
    res = ivf_topk(
        df, "vec_id", "embedding", k=3, n_centroids=16, n_probe=4,
        queries=df.where(F.col("vec_id") < 10),
    ).collect()
    qids = {r["query_id"] for r in res}
    assert qids <= set(range(10)) and len(qids) == 10
    # full-query run agrees with the filtered run on the common queries
    full = ivf_topk(df, "vec_id", "embedding", k=3, n_centroids=16, n_probe=4)
    full_map = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in full.where(F.col("query_id") < 10).collect()
    }
    for r in res:
        assert full_map[(r["query_id"], r["rank"])] == r["neighbor_id"]
