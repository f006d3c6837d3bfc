"""Incremental dedup index: per-increment folds must reproduce the
from-scratch batch run over the concatenated corpus (operators/incremental.py
correctness contract), including across-increment duplicates, hot buckets,
and content-less docs."""

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.datagen import generate_pages
from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
from cs588_data_science_bug_duplicate_detector_spark.operators.incremental import DedupIndex
from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import minhash_edges
from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import simhash_edges


def _batch_labels(docs, cfg):
    from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import release_cached_deps

    edges, _hot = minhash_edges(docs, "doc_id", "text", cfg)
    sim = simhash_edges(docs, "doc_id", "text", cfg)
    all_edges = (
        edges.unionByName(exact_dup_edges(docs, "doc_id", "text"))
        .unionByName(sim)
        .distinct()
    )
    labels = connected_components(all_edges, vertices=docs.select("doc_id"))
    release_cached_deps(edges)
    release_cached_deps(sim)
    return labels


def _assert_labels_equal(inc_labels, batch_labels):
    """Both label sets use min-member cluster ids, so equal partitions
    mean equal (id, cluster_id) rows — assert the strong form."""
    j = inc_labels.select(
        "id", F.col("cluster_id").alias("ca")
    ).join(
        batch_labels.select("id", F.col("cluster_id").alias("cb")), "id", "full"
    )
    assert j.where(
        F.col("ca").isNull() | F.col("cb").isNull() | (F.col("ca") != F.col("cb"))
    ).count() == 0


def test_incremental_matches_batch_on_planted_corpus(spark, tmp_path):
    cfg = DedupConfig()
    pages, truth, _spans = generate_pages(spark, 450, seed=7)
    docs = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    ).select("doc_id", "text").cache()

    idx = DedupIndex(str(tmp_path / "idx"), cfg)
    labels = None
    for i in range(3):  # doc_id % 3 splits planted clusters across increments
        labels = idx.add_increment(
            docs.where(F.col("doc_id") % 3 == i), "doc_id", "text"
        )
    assert idx.meta()["n_increments"] == 3
    # superseded label snapshots pruned: only v1 (predecessor) and v2 remain
    import os

    label_dirs = sorted(os.listdir(tmp_path / "idx" / "labels"))
    assert label_dirs == ["v1", "v2"]

    _assert_labels_equal(labels, _batch_labels(docs, cfg))

    # cross-increment planted dup pairs really did connect (non-vacuous:
    # truth pairs whose endpoints landed in different increments)
    tr = truth.select(
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("tid"),
        "true_cluster_id",
    )
    t = (
        tr.alias("x")
        .join(tr.alias("y"), "true_cluster_id")
        .where(
            (F.col("x.tid") < F.col("y.tid"))
            & ((F.col("x.tid") % 3) != (F.col("y.tid") % 3))
        )
        .select(F.col("x.tid").alias("qa"), F.col("y.tid").alias("qb"))
    )
    assert t.count() > 0
    la = labels.select(F.col("id").alias("qa"), F.col("cluster_id").alias("ca"))
    lb = labels.select(F.col("id").alias("qb"), F.col("cluster_id").alias("cb"))
    joined = t.join(la, "qa").join(lb, "qb")
    assert joined.where(F.col("ca") != F.col("cb")).count() == 0


def test_incremental_hot_bucket_and_blank_docs(spark, tmp_path):
    # bucket_salt exercises the salted sub-bucket pairing in BOTH the
    # batch path and the fold — equality below covers their agreement
    cfg = DedupConfig(bucket_cap=8, bucket_salt=4)
    base = " ".join(f"tok{i}" for i in range(120))
    rows = [(i, f"{base} variant{i}") for i in range(60)]  # boilerplate farm
    rows += [(100, None), (101, "   "), (102, "wholly unrelated text here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    idx = DedupIndex(str(tmp_path / "idx"), cfg)
    labels = None
    for i in range(3):
        labels = idx.add_increment(
            docs.where(F.col("doc_id") % 3 == i), "doc_id", "text"
        )

    _assert_labels_equal(labels, _batch_labels(docs, cfg))
    # the farm is one cluster even through capped buckets; the blank/NULL
    # and unrelated docs stay singletons
    farm = labels.where(F.col("id") < 60)
    assert farm.select("cluster_id").distinct().count() == 1
    singles = labels.where(F.col("id") >= 100)
    assert singles.count() == 3
    assert singles.select("cluster_id").distinct().count() == 3


def test_incremental_char_shingle_mode(spark, tmp_path):
    """CJK-style unsegmented text: the index must store the same
    char-shingle MinHash signatures the batch detector computes (the
    dual-signature kernel is token-only, so _signed_increment branches)."""
    cfg = DedupConfig(shingle_mode="char")
    base = "吾輩は猫である名前はまだ無い何でも薄暗いじめじめした所でニャーニャー泣いていた事だけは記憶している" * 3
    rows = [(i, base + f"追記{i % 4}") for i in range(12)]
    rows += [(50, "全く別の内容の文書でありどの文書とも似ていない" * 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    idx = DedupIndex(str(tmp_path / "idx"), cfg)
    labels = None
    for i in range(2):
        labels = idx.add_increment(
            docs.where(F.col("doc_id") % 2 == i), "doc_id", "text"
        )
    _assert_labels_equal(labels, _batch_labels(docs, cfg))
    # the near-identical CJK docs really did cluster (char shingles work)
    assert labels.where(F.col("id") < 12).select("cluster_id").distinct().count() == 1


def test_compact_preserves_index(spark, tmp_path):
    """Compaction merges increment dirs without changing the stored
    signatures, and folds after compaction still equal the batch run."""
    import os

    cfg = DedupConfig()
    rows = [(i, f"document number {i} body words {' '.join(str(j) for j in range(i % 7 + 5))}")
            for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(6)]  # cross-increment copies
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    idx = DedupIndex(str(tmp_path / "idx"), cfg)
    for i in range(3):
        idx.add_increment(docs.where(F.col("doc_id") % 4 == i), "doc_id", "text")

    before = idx.signatures(spark).orderBy("id").collect()
    merged = idx.compact(spark)
    assert merged == 2
    assert sorted(os.listdir(tmp_path / "idx" / "sigs")) == ["inc=0"]
    assert idx.signatures(spark).orderBy("id").collect() == before

    labels = idx.add_increment(docs.where(F.col("doc_id") % 4 == 3), "doc_id", "text")
    _assert_labels_equal(labels, _batch_labels(docs, cfg))


def test_use_simhash_false_roundtrip(spark, tmp_path):
    """A use_simhash=False index must accept follow-up increments (the
    flag persists in meta) and still refuse a True reopen."""
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with words") for i in range(8)],
        "doc_id long, text string",
    )
    idx = DedupIndex(str(tmp_path / "idx"), DedupConfig(), use_simhash=False)
    idx.add_increment(docs.where(F.col("doc_id") < 4), "doc_id", "text")
    idx.add_increment(docs.where(F.col("doc_id") >= 4), "doc_id", "text")
    assert idx.meta()["use_simhash"] is False
    with pytest.raises(ValueError, match="detector-set mismatch"):
        DedupIndex(str(tmp_path / "idx"), DedupConfig(), use_simhash=True).add_increment(
            docs, "doc_id", "text"
        )


def test_index_guards(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "some text one"), (2, "other text two")], "doc_id long, text string"
    )
    idx = DedupIndex(str(tmp_path / "idx"), DedupConfig())
    # reliable CC checkpoints pass through to the fold
    idx.add_increment(docs, "doc_id", "text", cc_kwargs={"reliable": True})

    # config mismatch refuses
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        DedupIndex(str(tmp_path / "idx"), DedupConfig(bucket_cap=7)).add_increment(
            docs, "doc_id", "text"
        )
    # detector-set mismatch refuses
    with pytest.raises(ValueError, match="detector-set mismatch"):
        DedupIndex(str(tmp_path / "idx"), DedupConfig(), use_simhash=False).add_increment(
            docs, "doc_id", "text"
        )
    # duplicate doc ids across increments refuse (labels can't cover them)
    with pytest.raises(ValueError, match="duplicate doc ids"):
        idx.add_increment(docs, "doc_id", "text")


def test_compact_crash_recovery(spark, tmp_path):
    """Round-6 crash contract: compaction is WAL-logged in meta.json, so a
    crash at any point after the intent write leaves an index that the
    next entry point (signatures/add_increment/compact) finishes
    idempotently — a partial signature index is never readable."""
    import json
    import os
    import shutil

    cfg = DedupConfig()
    rows = [(i, f"document number {i} body words {' '.join(str(j) for j in range(i % 7 + 5))}")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = str(tmp_path / "idx")
    idx = DedupIndex(root, cfg)
    for i in range(3):
        idx.add_increment(docs.where(F.col("doc_id") % 4 == i), "doc_id", "text")
    before = idx.signatures(spark).orderBy("id").collect()

    # simulate a crash mid-compaction: staged merge fully written + intent
    # recorded + ONE source dir already deleted, swap never ran
    staged = idx._staged_dir
    idx.signatures(spark, upto=3).write.mode("overwrite").parquet(staged)
    meta = idx.meta()
    meta["compact"] = {"merged": [0, 1, 2]}
    idx._write_meta(meta)
    shutil.rmtree(idx._sig_dir(1))

    # any entry point must first finish the compaction, then read a FULL index
    assert idx.signatures(spark).orderBy("id").collect() == before
    assert "compact" not in idx.meta()
    assert sorted(os.listdir(tmp_path / "idx" / "sigs")) == ["inc=0"]
    assert not os.path.isdir(staged)

    # crash BEFORE the intent write (staged garbage only): sources untouched,
    # staged is swept, signatures unchanged
    os.makedirs(os.path.join(staged, "junk"))
    assert idx.signatures(spark).orderBy("id").collect() == before
    assert not os.path.isdir(staged)

    # a staged dir without _SUCCESS while an intent exists is corruption ->
    # loud refusal, not a guess
    os.makedirs(staged)
    meta = idx.meta()
    meta["compact"] = {"merged": [0]}
    idx._write_meta(meta)
    with pytest.raises(RuntimeError, match="without _SUCCESS"):
        idx.signatures(spark)
    shutil.rmtree(staged)
    meta = idx.meta()
    meta.pop("compact")
    idx._write_meta(meta)

    # and folds after a recovered compaction still equal the batch run
    labels = idx.add_increment(docs.where(F.col("doc_id") % 4 == 3), "doc_id", "text")
    _assert_labels_equal(labels, _batch_labels(docs, cfg))
