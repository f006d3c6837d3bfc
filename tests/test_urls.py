"""Canonical-URL normalization (functions/urls.py): Spark and the
generated DuckDB twin must agree byte-for-byte on every normalization
rule, and the streaming ingest's canonicalized dedup must collapse
frontier noise to one admission."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from cs588_data_science_bug_duplicate_detector_spark.functions.urls import (
    canonical_url,
    canonical_url_sql,
)

CASES = [
    # (input, expected canonical)
    ("https://WWW.ExampleSite.org/p/123", "https://examplesite.org/p/123"),
    ("https://examplesite.org/p/123/?utm_source=feed", "https://examplesite.org/p/123"),
    ("https://examplesite.org:443/p/123#section-2", "https://examplesite.org/p/123"),
    ("http://site.org:80/a", "http://site.org/a"),
    ("http://site.org:8080/a", "http://site.org:8080/a"),  # non-default kept
    ("https://examplesite.org/p/123/", "https://examplesite.org/p/123"),
    ("http://site.org/a?x=1&utm_campaign=c&y=2", "http://site.org/a?x=1&y=2"),
    ("http://site.org/a?utm_a=1&utm_b=2&z=3", "http://site.org/a?z=3"),
    ("https://site.org/a?ref=hn", "https://site.org/a"),
    ("https://site.org/a?refx=keepme", "https://site.org/a?refx=keepme"),
    ("https://site.org/A/Path?Q=Mixed", "https://site.org/A/Path?Q=Mixed"),  # path/query case kept
    ("HTTPS://SITE.ORG/x", "https://site.org/x"),
    ("https://site.org/a#frag?not=query", "https://site.org/a"),
    ("http://www.site.org:80/b/?utm_x=1#f", "http://site.org/b"),
    ("not a url at all", "not a url at all"),
    ("", ""),
    (None, None),
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(c,) for c, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [e for _, e in CASES]


def test_duckdb_twin_matches_spark(spark):
    """Java regex (Spark) vs RE2 (DuckDB) over every rule."""
    inputs = [c for c, _ in CASES]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('url')} FROM (SELECT unnest(?) AS url)",
            [inputs],
        ).fetchall()
    ]
    assert duck == [e for _, e in CASES]


def test_streaming_canonical_dedup(spark, tmp_path):
    """Five dirty variants of one page arrive in-stream; canonicalized
    dedup admits exactly one (raw dedup would admit all five)."""
    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("https://WWW.Site.org/p/1", ts, None, "body one", "en"),
        ("https://site.org/p/1/?utm_source=feed", ts, None, "body one", "en"),
        ("https://site.org:443/p/1#top", ts, None, "body one", "en"),
        ("https://site.org/p/1/", ts, None, "body one", "en"),
        ("https://site.org/p/1?fbclid=z", ts, None, "body one", "en"),
        ("https://site.org/p/2", ts, None, "body two", "en"),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.parquet(src)

    from cs588_data_science_bug_duplicate_detector_spark.streaming.ingest import (
        deduped_pages,
        read_pages_stream,
    )

    out = deduped_pages(read_pages_stream(spark, src), canonicalize=True)
    q = (
        out.writeStream.format("memory")
        .queryName("canon_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    admitted = spark.sql("SELECT url, text FROM canon_dedup_test").collect()
    texts = sorted(r.text for r in admitted)
    assert texts == ["body one", "body two"]
    # original (uncanonicalized) url column survives
    assert all(r.url.startswith("http") for r in admitted)
