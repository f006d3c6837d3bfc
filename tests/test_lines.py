"""Line-level boilerplate removal + intra-doc repetition stats."""

import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.operators.lines import (
    boilerplate_keys,
    remove_boilerplate,
    repetition_stats,
    split_lines,
)

FOOTER = "(c) example.org | all rights reserved"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 3 docs sharing the footer (and one nav line in 2 of them)
        (1, f"alpha body one\n{FOOTER}\nhome | about"),
        (2, f"beta body two\n\n{FOOTER}\nhome | about"),
        (3, f"  {FOOTER}  \ngamma body three"),  # whitespace variant, strip-keyed
        (4, FOOTER),  # all-boilerplate doc
        (5, None),  # NULL text
        (6, "unique body\nunique body\nunique body\ntail line"),  # intra-doc repeats
        (7, "   \nonly blank lines\n   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_keys_threshold_and_blank_exclusion(corpus):
    lines = split_lines(corpus, "doc_id", "text")
    keys3 = boilerplate_keys(lines, min_docs=3)
    # footer appears in docs 1,2,3,4 (>=3); nav line only in 1,2
    assert keys3.count() == 1
    keys2 = {r.key for r in boilerplate_keys(lines, min_docs=2).collect()}
    assert len(keys2) == 2
    # blank lines (doc 2's empty line, doc 7's whitespace lines) never count
    blank_docs = lines.where(~F.col("counted")).select("id").distinct().count()
    assert blank_docs == 2


def test_remove_boilerplate_order_nulls_and_strip_matching(corpus):
    out = {r.id: r for r in remove_boilerplate(corpus, "doc_id", "text", min_docs=3).collect()}
    assert len(out) == 7
    # order preserved, footer gone, nav kept (below threshold)
    assert out[1].clean_text == "alpha body one\nhome | about"
    # blank line survives removal untouched
    assert out[2].clean_text == "beta body two\n\nhome | about"
    # whitespace-variant footer matches via the stripped key; original bytes
    # of KEPT lines preserved
    assert out[3].clean_text == "gamma body three"
    assert out[3].n_removed == 1
    # all-boilerplate doc -> empty string, not NULL
    assert out[4].clean_text == ""
    assert (out[4].n_lines, out[4].n_removed) == (1, 1)
    # NULL text -> NULL clean_text, zero counts
    assert out[5].clean_text is None
    assert (out[5].n_lines, out[5].n_removed) == (0, 0)
    # untouched doc
    assert out[6].clean_text == "unique body\nunique body\nunique body\ntail line"
    assert out[6].n_removed == 0


def test_repetition_stats(corpus):
    out = {r.id: r for r in repetition_stats(corpus, "doc_id", "text").collect()}
    assert len(out) == 7
    # doc 6: 4 non-blank lines, 3 copies of one line -> 3/4 lines, and
    # chars: 3*11 / (3*11 + 9)
    assert out[6].n_lines == 4
    assert out[6].dup_line_frac == pytest.approx(0.75)
    assert out[6].dup_char_frac == pytest.approx(33 / 42, abs=1e-6)
    # no intra-doc repeats in doc 1
    assert out[1].dup_line_frac == 0.0
    # NULL text and blank-only lines -> 0 lines, 0.0 fracs
    assert (out[5].n_lines, out[5].dup_line_frac, out[5].dup_char_frac) == (0, 0.0, 0.0)
    assert out[7].n_lines == 1  # doc 7 has one non-blank line
