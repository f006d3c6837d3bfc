"""PII masking (functions/pii.py): rule cases + Spark==DuckDB byte parity
(the twin-SQL contract that makes the driver oracle full-value)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.functions.pii import (
    mask_pii,
    mask_pii_sql,
    pii_counts,
    pii_counts_sql,
)

CASES = [
    # email shapes; masked before phone can clip digits
    ("mail me at john.doe+spam@ex-ample.org today", "mail me at <EMAIL> today"),
    ("a@b.co and C.D@sub.domain.io!", "<EMAIL> and <EMAIL>!"),
    # ipv4 incl. malformed octets (over-masking is the safe side)
    ("server 10.0.0.1 and 999.1.1.1.", "server <IP> and <IP>."),
    # version strings with 3 octets do NOT mask
    ("release 1.2.3 is out", "release 1.2.3 is out"),
    # phones: E.164, spaced international, NANP paren + dash
    ("call +4915123456789 now", "call <PHONE> now"),
    ("call +1 555 0172 300 now", "call <PHONE> now"),
    ("dial (555) 123-4567 or 555-123-4567", "dial <PHONE> or <PHONE>"),
    # bare long digit runs stay (order ids are not PII here)
    ("order 1234567890123 shipped", "order 1234567890123 shipped"),
    # email with digits is one EMAIL, not an email plus a phone
    ("x 123456789@qq.com y", "x <EMAIL> y"),
    (None, None),
    ("", ""),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_mask_rules(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "text string")
    got = df.select(mask_pii("text").alias("m")).collect()[0]["m"]
    assert got == want


def test_spark_duckdb_byte_parity(spark):
    rows = [(c[0],) for c in CASES if c[0] is not None]
    df = spark.createDataFrame(rows, "text string")
    got_spark = [
        (r["m"], r["ne"], r["ni"], r["np"])
        for r in df.select(
            mask_pii("text").alias("m"),
            pii_counts("text")["email"].alias("ne"),
            pii_counts("text")["ipv4"].alias("ni"),
            pii_counts("text")["phone"].alias("np"),
        ).collect()
    ]
    con = duckdb.connect()
    csql = pii_counts_sql("text")
    got_duck = []
    for (raw,) in rows:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT ? AS text", [raw])
        got_duck.append(
            tuple(
                con.execute(
                    f"SELECT {mask_pii_sql('text')}, {csql['email']}, "
                    f"{csql['ipv4']}, {csql['phone']} FROM t"
                ).fetchone()
            )
        )
    assert got_spark == got_duck


def test_null_text_counts_zero_not_null(spark):
    # a corpus audit must bucket NULL-text docs as "0 findings", not drop
    # them (NULL would vanish from sum() rollups and both filter branches)
    df = spark.createDataFrame([(None,)], "text string")
    c = pii_counts("text")
    row = df.select(
        c["email"].alias("e"), c["ipv4"].alias("i"), c["phone"].alias("p")
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (0, 0, 0)


def test_counts_match_mask_effect(spark):
    text = "a@b.co then 10.0.0.1 then (555) 123-4567 and +4915123456789"
    df = spark.createDataFrame([(text,)], "text string")
    c = pii_counts("text")
    row = df.select(
        c["email"].alias("e"), c["ipv4"].alias("i"), c["phone"].alias("p"),
        mask_pii("text").alias("m"),
    ).collect()[0]
    assert (row["e"], row["i"], row["p"]) == (1, 1, 2)
    assert row["m"].count("<EMAIL>") == 1
    assert row["m"].count("<IP>") == 1
    assert row["m"].count("<PHONE>") == 2
