"""End-to-end degenerate-input probes: empty corpus, NULL/blank text,
single doc. The kernels each handle these (test_hashing), but the full
detect -> CC surface must too — a 100 TB crawl WILL contain empty
partitions and null extractions, and a crash there kills the whole job."""

from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.operators.cc import connected_components
from cs588_data_science_bug_duplicate_detector_spark.operators.exact import exact_dup_edges
from cs588_data_science_bug_duplicate_detector_spark.operators.minhash import minhash_edges
from cs588_data_science_bug_duplicate_detector_spark.operators.simhash import (
    simhash_edges_from_sigs,
    with_simhash,
)
from cs588_data_science_bug_duplicate_detector_spark.operators.suffix import suffix_edges

DOC_SCHEMA = "doc_id long, text string"


def _detect_all(docs, cfg):
    mh, _hot = minhash_edges(docs, "doc_id", "text", cfg)
    sh = simhash_edges_from_sigs(
        with_simhash(docs.select("doc_id", "text"), "text").select("doc_id", "simhash"),
        "doc_id",
        cfg,
    )
    sx = suffix_edges(docs, "doc_id", "text", cfg)
    return mh.unionByName(exact_dup_edges(docs, "doc_id", "text")).unionByName(sh).unionByName(sx)


def test_empty_corpus_end_to_end(spark):
    docs = spark.createDataFrame([], DOC_SCHEMA).where(F.lit(False))
    edges = _detect_all(docs, DedupConfig())
    assert edges.count() == 0
    labels = connected_components(edges, vertices=docs.select("doc_id"))
    assert labels.count() == 0


def test_null_and_blank_text_get_singleton_labels(spark):
    body = " ".join(f"w{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, body), (5, body)], DOC_SCHEMA
    )
    edges = _detect_all(docs, DedupConfig())
    labels = connected_components(edges, vertices=docs.select("doc_id"))
    lab = {r["id"]: r["cluster_id"] for r in labels.collect()}
    # every doc labeled exactly once; the two real dups merge
    assert set(lab) == {1, 2, 3, 4, 5}
    assert lab[4] == lab[5]
    # null/blank docs must NOT merge with each other or anything else
    # (a null text is unknown content, not "equal to every other null")
    assert len({lab[1], lab[2], lab[3]}) == 3
    assert lab[1] != lab[4]


def test_whitespace_only_docs_never_weld(spark):
    """'\\n'-only extractions are the common output of a failed HTML parse;
    trim() strips only ASCII spaces, so a trim-based content check would
    weld every such doc into one md5('\\n') mega-cluster. The content gate
    must use full-whitespace semantics."""
    docs = spark.createDataFrame(
        [(1, "\n"), (2, "\n"), (3, "\t\n"), (4, "\t\n"), (5, " \r\n "), (6, " \r\n ")],
        DOC_SCHEMA,
    )
    assert exact_dup_edges(docs, "doc_id", "text").count() == 0
    labels = connected_components(
        exact_dup_edges(docs, "doc_id", "text"), vertices=docs.select("doc_id")
    )
    assert labels.select("cluster_id").distinct().count() == 6


def test_single_doc_corpus(spark):
    docs = spark.createDataFrame([(7, "only one document here at all")], DOC_SCHEMA)
    edges = _detect_all(docs, DedupConfig())
    assert edges.count() == 0
    labels = connected_components(edges, vertices=docs.select("doc_id"))
    rows = labels.collect()
    assert len(rows) == 1 and rows[0]["cluster_id"] is not None
