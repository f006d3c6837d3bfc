"""Gopher quality rules (functions/gopher.py): per-rule cases + the
Spark==DuckDB twin parity that backs the driver oracle."""

import duckdb
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.functions.gopher import (
    GOPHER_BOUNDS,
    gopher_columns,
    gopher_columns_sql,
)

GOOD = (
    "the quick brown fox jumps over that lazy dog and we have fun with it "
    * 5
)  # 15 words x 5 = 75, normal lengths, stopwords present

CASES = [
    # (text, failing_rule or None)
    (GOOD, None),
    ("short text with the and that", "r_word_count"),              # < 50 words
    (("a " * 60).strip() + " the be to of and", "r_mean_word_len"),  # mean ~1
    (GOOD + " " + "#" * 1 + " #### ### ## # # # #", "r_symbol_ratio"),
    (GOOD + "\n" + "\n".join("- bullet item here" for _ in range(40)), "r_bullet_lines"),
    (GOOD + "\n" + "\n".join("this line trails off..." for _ in range(40)), "r_ellipsis_lines"),
    (GOOD + " " + " ".join("12345" for _ in range(40)), "r_alpha_words"),
    (" ".join(f"word{i}" for i in range(60)), "r_stop_words"),
    (None, "r_word_count"),
    ("", "r_word_count"),
]


def _report(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    cols = gopher_columns("text")
    return df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0].asDict()


def test_good_doc_passes(spark):
    r = _report(spark, GOOD)
    assert r["passes_gopher"] is True
    assert r["n_words"] == 75 and r["n_stop_hits"] >= 2


def test_each_rule_fails_its_case(spark):
    for text, bad in CASES:
        r = _report(spark, text)
        if bad is None:
            assert r["passes_gopher"] is True, text
        else:
            assert r[bad] is False, (text, bad, r)
            assert r["passes_gopher"] is False


def test_symbol_ratio_boundary_passes(spark):
    # Gopher removes docs with ratio > 0.1, so EXACTLY 0.1 must pass.
    # '#' tokens count as words too: 54 words + 6 '#' -> 10*6 == 60 == n_words
    base = ("tok " * 54).strip()
    r = _report(spark, base + " # # # # # #")
    assert r["n_words"] == 60 and r["n_symbols"] == 6
    assert r["r_symbol_ratio"] is True
    # one more symbol tips it over: 10*7 = 70 > 61
    r2 = _report(spark, base + " # # # # # # #")
    assert r2["n_words"] == 61 and r2["n_symbols"] == 7
    assert r2["r_symbol_ratio"] is False


def test_spark_duckdb_parity(spark):
    texts = [t for t, _ in CASES if t is not None] + [
        "tabs\tand\rreturns the be to of and " + GOOD,
        "unicode bullet\n• item one\n• item two\n" + GOOD,
        "ellipsis… line…\n" + GOOD,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    cols = gopher_columns("text")
    names = list(cols)
    got_spark = [
        tuple(r[n] for n in names)
        for r in df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    ]
    con = duckdb.connect()
    csql = gopher_columns_sql("text")
    sel = ", ".join(f"{csql[n]} AS {n}" for n in names)
    got_duck = []
    for t in texts:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS text", [t])
        got_duck.append(tuple(con.execute(f"SELECT {sel} FROM t").fetchone()))
    assert got_spark == got_duck


def test_bounds_are_single_source():
    # the SQL twin embeds the same thresholds the Spark side reads
    sql = gopher_columns_sql("text")["r_word_count"]
    assert str(GOPHER_BOUNDS["min_words"]) in sql
    assert str(GOPHER_BOUNDS["max_words"]) in sql
