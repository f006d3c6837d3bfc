"""Datagen invariants: determinism, planted Jaccard levels, unique urls,
distributed generation consistency."""

import numpy as np
import pandas as pd
import pytest

from cs588_data_science_bug_duplicate_detector_spark.config import DedupConfig
from cs588_data_science_bug_duplicate_detector_spark.datagen import (
    generate_pages_distributed,
    generate_pages_pdf,
)
from cs588_data_science_bug_duplicate_detector_spark.functions.hashing import shingle_set


def test_deterministic_across_calls():
    a, ta, sa = generate_pages_pdf(300, seed=42)
    b, tb, sb = generate_pages_pdf(300, seed=42)
    assert a.equals(b) and ta.equals(tb) and sa.equals(sb)
    c, _, _ = generate_pages_pdf(300, seed=43)
    assert not a["text"].equals(c["text"])


def test_urls_unique_and_truth_subset():
    pages, truth, spans = generate_pages_pdf(500, seed=42)
    assert pages["url"].is_unique
    assert set(truth["url"]) <= set(pages["url"])
    assert len(truth) > 100  # substantial planted structure


def test_planted_near_dup_jaccard_levels():
    """Block edits must land near their target SHINGLE jaccard, and every
    truth pair must clear the detector's verify threshold with margin."""
    cfg = DedupConfig()
    pages, truth, _ = generate_pages_pdf(400, seed=42)
    text_by_url = dict(zip(pages["url"], pages["text"]))
    by_cluster = {}
    for _, r in truth.iterrows():
        by_cluster.setdefault(r["true_cluster_id"], []).append(r["url"])
    lows = []
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        root = members[0]
        s_root = shingle_set(text_by_url[root], cfg.shingle_k)
        for m in members[1:]:
            s_m = shingle_set(text_by_url[m], cfg.shingle_k)
            j = len(s_root & s_m) / len(s_root | s_m)
            lows.append(j)
    lows = np.array(lows)
    assert lows.min() >= 0.7   # every planted pair above verify threshold+margin
    assert (lows < 0.93).any()  # and genuinely near (not all exact) dups


def test_distributed_generation(spark):
    df = generate_pages_distributed(spark, 12_000, seed=42, slice_size=4000)
    n = df.count()
    assert n == 12_000
    assert df.select("url").distinct().count() == n
    # deterministic across plans
    h1 = df.selectExpr("bit_xor(xxhash64(url, text)) AS h").collect()[0]["h"]
    df2 = generate_pages_distributed(spark, 12_000, seed=42, slice_size=4000)
    h2 = df2.selectExpr("bit_xor(xxhash64(url, text)) AS h").collect()[0]["h"]
    assert h1 == h2
