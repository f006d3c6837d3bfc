"""Equivalence of the 1-D retrieval-metrics kernel vs the all-pairs path.

The round-6 optimization replaced the O(n²) within-group pair join feeding
q_retrieval_metrics with sorted-array per-group kernels
(operators/metrics.py retrieval_metrics_1d). These tests pin exact
equivalence on adversarial shapes: heavy value ties (tie groups larger
than top-k), equidistant levels on both sides, unique-label queries
(n_rel=0 drops), NULL labels, and first-relevant far beyond top-k (the
fallback rank-count path).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.operators.metrics import (
    per_query_metrics,
    per_query_metrics_1d,
    retrieval_metrics,
    retrieval_metrics_1d,
)

K_VALUES = (1, 5, 10, 20)


def _pairs(docs):
    """Same pair semantics as __spark_entry__._retrieval_pairs."""
    a = docs.select(
        F.col("doc_id").alias("query_id"),
        F.col("lang").alias("lang_a"),
        F.col("source").alias("source_a"),
        F.col("n_chars").alias("chars_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("cand_id"),
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("n_chars").alias("chars_b"),
    )
    return a.join(
        b, (F.col("lang_a") == F.col("lang_b")) & (F.col("query_id") != F.col("cand_id"))
    ).select(
        "query_id",
        "cand_id",
        (F.lit(1.0) / (F.lit(1.0) + F.abs(F.col("chars_a") - F.col("chars_b")))).alias(
            "score"
        ),
        (F.col("source_a") == F.col("source_b")).alias("is_dup"),
    )


def _make_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )


def _assert_equivalent(spark, docs):
    old = {r["query_id"]: r.asDict() for r in per_query_metrics(_pairs(docs), K_VALUES).collect()}
    new = {r["query_id"]: r.asDict() for r in per_query_metrics_1d(docs, K_VALUES, n_salt=3).collect()}
    assert set(old) == set(new)
    for q in old:
        o, n = old[q], new[q]
        assert o["n_rel"] == n["n_rel"], (q, o, n)
        assert o["rr"] == n["rr"], (q, o, n)  # both are exact 1/rank doubles
        for k in K_VALUES:
            assert o[f"hit_{k}"] == n[f"hit_{k}"], (q, k, o, n)
            assert math.isclose(
                o[f"psum_{k}"], n[f"psum_{k}"], rel_tol=1e-12, abs_tol=1e-12
            ), (q, k, o, n)
    tot_old = sorted(tuple(r) for r in retrieval_metrics(_pairs(docs), K_VALUES).collect())
    tot_new = sorted(tuple(r) for r in retrieval_metrics_1d(docs, K_VALUES, n_salt=3).collect())
    for ro, rn in zip(tot_old, tot_new):
        assert ro[0] == rn[0] and ro[4] == rn[4]
        for i in (1, 2, 3):
            assert math.isclose(ro[i], rn[i], rel_tol=1e-12, abs_tol=1e-12), (ro, rn)


def test_random_with_heavy_ties(spark):
    import random

    rng = random.Random(42)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                rng.choice(["en", "de"]),
                f"s{rng.randrange(5)}",
                # values in a tiny range -> tie groups far larger than top-20
                rng.randrange(4) + 100,
            )
        )
    _assert_equivalent(spark, _make_docs(spark, rows))


def test_random_spread_values(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.choice(["en", "de", "fr"]), f"s{rng.randrange(8)}", rng.randrange(1000))
        for i in range(300)
    ]
    _assert_equivalent(spark, _make_docs(spark, rows))


def test_fallback_first_relevant_beyond_topk(spark):
    # query 0's only same-source partner sits at distance 500 behind a wall
    # of 30 closer other-source docs -> rr must come from the fallback
    # rank-count, not the top-20 list.
    rows = [(0, "en", "rare", 0), (1, "en", "rare", 500)]
    rows += [(10 + j, "en", f"wall{j}", 5 + j) for j in range(30)]
    docs = _make_docs(spark, rows)
    _assert_equivalent(spark, docs)
    new = {r["query_id"]: r.asDict() for r in per_query_metrics_1d(docs, K_VALUES, n_salt=2).collect()}
    assert new[0]["rr"] == 1.0 / 31  # 30 closer docs rank before the partner


def test_equidistant_levels_and_id_tiebreak(spark):
    # candidates at +d and -d interleave by id; ties inside a level break
    # by cand_id asc in both paths
    rows = [(50, "en", "q", 100), (51, "en", "q", 104)]
    rows += [(i, "en", f"a{i}", 98) for i in (3, 7, 99)]
    rows += [(i, "en", f"b{i}", 102) for i in (1, 5, 98)]
    _assert_equivalent(spark, _make_docs(spark, rows))


def test_null_sources_and_null_lang(spark):
    rows = [
        (0, "en", None, 100),
        (1, "en", None, 100),
        (2, "en", "s", 101),
        (3, "en", "s", 102),
        (4, None, "s", 103),  # NULL lang: joins nothing in the pair path
        (5, None, "s", 103),
    ]
    _assert_equivalent(spark, _make_docs(spark, rows))


def test_null_value_column_raises(spark):
    rows = [(0, "en", "s", 100), (1, "en", "s", None)]
    with pytest.raises(Exception):
        per_query_metrics_1d(_make_docs(spark, rows), K_VALUES, n_salt=2).collect()


def test_single_doc_groups_and_empty(spark):
    rows = [(0, "en", "s", 100), (1, "de", "t", 50)]
    docs = _make_docs(spark, rows)
    # every query has n_rel == 0 -> empty per-query frame in both paths
    assert per_query_metrics(_pairs(docs), K_VALUES).count() == 0
    assert per_query_metrics_1d(docs, K_VALUES, n_salt=2).count() == 0
