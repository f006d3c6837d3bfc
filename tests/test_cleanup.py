"""Text normalization (functions/cleanup.py): rule cases + Spark==DuckDB
byte parity over unicode whitespace / zero-width / control-char inputs."""

import duckdb
import pytest

from cs588_data_science_bug_duplicate_detector_spark.functions.cleanup import (
    chars_removed,
    chars_removed_sql,
    clean_text,
    clean_text_sql,
)

CASES = [
    # zero-widths rejoin words (deleted BEFORE space handling)
    ("wo​rd and‌ more﻿", "word and more"),
    # NBSP and friends become plain spaces, runs collapse
    ("a b c　 d", "a b c d"),
    # C0 controls + DEL dropped; a LONE \t survives (only runs collapse)
    ("a\x00b\x07c\td\x7fe", "abc\tde"),
    # a tab RUN collapses to one space
    ("a\t\tb", "a b"),
    # trailing spaces before newlines + newline towers
    ("line1   \nline2\n\n\n\n\nline3", "line1\nline2\n\nline3"),
    # whole-doc trim
    ("  \n\n hello world \n ", "hello world"),
    # already-clean text is untouched
    ("plain text stays the same", "plain text stays the same"),
    (None, None),
    ("", ""),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_clean_rules(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(clean_text("text").alias("c")).collect()[0]["c"]
    assert got == want


def test_chars_removed(spark):
    df = spark.createDataFrame([("a\x00b  c",), (None,)], "text string")
    got = [r["n"] for r in df.select(chars_removed("text").alias("n")).collect()]
    assert got == [2, 0]  # \x00 deleted + one space collapsed


def test_spark_duckdb_byte_parity(spark):
    rows = [(c[0],) for c in CASES if c[0] is not None]
    df = spark.createDataFrame(rows, "text string")
    got_spark = [
        (r["c"], r["n"])
        for r in df.select(
            clean_text("text").alias("c"), chars_removed("text").alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = []
    for (raw,) in rows:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS text", [raw])
        got_duck.append(
            tuple(
                con.execute(
                    f"SELECT {clean_text_sql('text')}, {chars_removed_sql('text')} FROM t"
                ).fetchone()
            )
        )
    assert got_spark == got_duck
