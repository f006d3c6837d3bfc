"""Suffix/long-shared-span detector: content-defined anchors find verbatim
shared spans regardless of offset; unrelated docs stay apart."""

import numpy as np
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.datagen import generate_pages
from cs588_data_science_bug_duplicate_detector_spark.operators.suffix import suffix_edges


def test_span_pairs_detected_any_offset(spark):
    rng = np.random.default_rng(7)
    vocab = [f"v{i}" for i in range(3000)]
    span = [str(w) for w in rng.choice(vocab, 80)]

    def doc(pre, post):
        return " ".join(
            [str(w) for w in rng.choice(vocab, pre)] + span + [str(w) for w in rng.choice(vocab, post)]
        )

    rows = [
        (1, doc(100, 100)),
        (2, doc(137, 63)),   # same span at a misaligned offset
        (3, doc(0, 200)),    # span at the very start
        (4, " ".join(str(w) for w in rng.choice(vocab, 300))),  # unrelated
        (5, " ".join(str(w) for w in rng.choice(vocab, 10))),   # too short
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    edges = suffix_edges(docs, "doc_id", "text", DedupConfig())
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    members = {x for e in got for x in e}
    assert {1, 2, 3} <= members
    assert 4 not in members and 5 not in members


def test_min_tokens_below_window_does_not_crash(spark):
    """suffix_min_tokens < suffix_window admits docs with no complete
    window; last_start would go negative and sequence(0, negative) steps
    DOWNWARD into invalid slice starts. Such docs must simply contribute
    zero windows (the DuckDB oracle's range(0, n-W+1) is empty for them)."""
    cfg = DedupConfig(suffix_min_tokens=30)  # window stays 50
    short = " ".join(f"w{i}" for i in range(35))   # 30 <= n < 50
    body = " ".join(f"s{i}" for i in range(80))
    docs = spark.createDataFrame(
        [(1, short), (2, short), (3, body), (4, body)], "doc_id long, text string"
    )
    edges = suffix_edges(docs, "doc_id", "text", cfg)
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    # short docs share text but have no >=50-token span — no edge, no crash;
    # the full-length pair still connects
    assert got == {(3, 4)}


def test_suffix_on_planted_pages(spark):
    cfg = DedupConfig()
    pages, truth, spans = generate_pages(spark, 300, seed=42)
    docs = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long")
    )
    edges = suffix_edges(docs, "doc_id", "text", cfg)
    edge_set = {frozenset((r["src"], r["dst"])) for r in edges.collect()}
    span_pairs = [
        frozenset(
            (
                int(r["url_a"].rsplit("/p/", 1)[1]),
                int(r["url_b"].rsplit("/p/", 1)[1]),
            )
        )
        for r in spans.collect()
    ]
    assert span_pairs
    found = sum(1 for p in span_pairs if p in edge_set)
    # 64-token planted spans vs 50-token windows + anchor sampling: high recall
    assert found / len(span_pairs) >= 0.9


def test_exhaustive_audit_mode_catches_exactly_w_spans(spark):
    """anchor_mod=1 (audit mode): a span of EXACTLY suffix_window tokens is
    guaranteed found — the sparse-anchor recall trade disappears. The span
    is planted at offsets engineered so sparse anchoring CAN miss it; the
    audit pass must not."""
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(5000)]
    cfg = DedupConfig(anchor_mod=1)
    span = [str(w) for w in rng.choice(vocab, cfg.suffix_window)]  # exactly W

    rows = []
    for doc_id, (pre, post) in enumerate([(60, 60), (93, 27), (0, 120)], start=1):
        body = (
            [str(w) for w in rng.choice(vocab, pre)]
            + span
            + [str(w) for w in rng.choice(vocab, post)]
        )
        rows.append((doc_id, " ".join(body)))
    rows.append((4, " ".join(str(w) for w in rng.choice(vocab, 240))))  # unrelated
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    edges = {(r["src"], r["dst"]) for r in suffix_edges(docs, "doc_id", "text", cfg).collect()}
    # star edges from min member 1 to the other two span-carriers; doc 4 out
    assert edges == {(1, 2), (1, 3)}
