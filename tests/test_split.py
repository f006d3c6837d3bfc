"""Hash-based corpus splitting (functions/split.py): determinism,
append-stability, ratio accuracy, Spark==DuckDB parity, k-rep sampling."""

import duckdb
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.functions.split import (
    split_column,
    split_column_sql,
)
from cs588_data_science_bug_duplicate_detector_spark.operators.canonical import (
    canonical_docs,
    sample_per_cluster,
)

W = {"train": 0.8, "val": 0.1, "test": 0.1}


def _assign(spark, n, seed=""):
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    return {
        r["doc_id"]: r["split"]
        for r in df.select("doc_id", split_column("doc_id", W, seed).alias("split")).collect()
    }


def test_deterministic_and_append_stable(spark):
    a = _assign(spark, 500)
    b = _assign(spark, 1000)  # corpus grew: old assignments must not move
    assert all(b[k] == v for k, v in a.items())
    assert _assign(spark, 500) == a


def test_ratios_and_seed_reshuffle(spark):
    a = _assign(spark, 5000)
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 5000 - 0.8) < 0.03
    assert abs(c["val"] / 5000 - 0.1) < 0.02
    assert abs(c["test"] / 5000 - 0.1) < 0.02
    b = _assign(spark, 5000, seed="v2")
    assert any(a[k] != b[k] for k in a)  # a new seed is a new partition


def test_spark_duckdb_parity(spark):
    df = spark.range(300).select(F.col("id").alias("doc_id"))
    got_spark = {
        r["doc_id"]: r["split"]
        for r in df.select("doc_id", split_column("doc_id", W, "s1").alias("split")).collect()
    }
    con = duckdb.connect()
    sql = split_column_sql("doc_id", W, "s1")
    got_duck = dict(
        con.execute(f"SELECT doc_id, {sql} FROM range(300) t(doc_id)").fetchall()
    )
    assert got_spark == got_duck


def test_null_key_gets_catch_all_split_under_any_seed(spark):
    # contract: keyless docs are quarantined in the LAST split, never
    # hashed into a seed-dependent one (a leak into train otherwise)
    df = spark.createDataFrame([(None,), (None,)], "doc_id long")
    for seed in ("", "s1", "v2", "r5"):
        got = {
            r["split"]
            for r in df.select(split_column("doc_id", W, seed).alias("split")).collect()
        }
        assert got == {"test"}, seed


def test_zero_weight_split_gets_nothing(spark):
    # cum == 1.0 must be an unconditional bound: bucket 'ffff' used to leak
    # into the zero-weight trailing split
    df = spark.range(70000).select(F.col("id").alias("doc_id"))
    w = {"train": 1.0, "holdout": 0.0}
    counts = (
        df.select(split_column("doc_id", w).alias("split"))
        .groupBy("split")
        .count()
        .collect()
    )
    assert {r["split"]: r["count"] for r in counts} == {"train": 70000}


def test_sample_per_cluster_k1_equals_canonical(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5)], "doc_id long, n_chars long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster_id long"
    )
    k1 = sorted(
        map(tuple, sample_per_cluster(docs, labels, 1).drop("rank").collect())
    )
    can = sorted(map(tuple, canonical_docs(docs, labels).collect()))
    assert k1 == can
    # tie on n_chars=30 -> min doc_id wins rank 1
    assert k1[0] == (1, 2, 30, 3)


def test_sample_per_cluster_k2(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5)], "doc_id long, n_chars long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id long, cluster_id long"
    )
    rows = sorted(map(tuple, sample_per_cluster(docs, labels, 2).collect()))
    # cluster 1 keeps ranks 1,2 (docs 2 then 3); singleton cluster keeps its doc
    assert rows == [(1, 2, 30, 3, 1), (1, 3, 30, 3, 2), (4, 4, 5, 1, 1)]
