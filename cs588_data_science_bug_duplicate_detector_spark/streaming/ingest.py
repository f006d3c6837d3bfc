"""Structured Streaming ingest for the pages table.

The reference is batch-only (SURVEY.md §2 "no streaming operators"), but the
target table carries event time (``warc_ts``), so a streaming ingest mode is
provided: watermarked url-dedup (exactly-once page admission within the
lateness bound) + per-window crawl statistics. Signature computation reuses
the SAME batch UDFs — a streaming micro-batch is just another Arrow batch.

Usage is availableNow/trigger-agnostic; sinks are the caller's choice
(tests use a memory sink; production appends to the Iceberg staging table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..operators.minhash import minhash_udf
from ..operators.simhash import _simhash_udf

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def deduped_pages(stream: DataFrame, watermark: str = "1 hour",
                  canonicalize: bool = False) -> DataFrame:
    """Drop re-crawled urls within the watermark horizon (state is bounded
    by the watermark — required for an unbounded 10^12-doc crawl).

    ``canonicalize=True`` dedupes on the canonical URL form
    (functions/urls.py: case-folded host, tracking params / fragments /
    default ports / trailing slashes stripped) so frontier noise — the
    same page under utm-decorated links — collapses to one admission.
    The original ``url`` column is preserved; the state key is the
    canonical form.
    """
    if canonicalize:
        from ..functions.urls import canonical_url

        return (
            stream.withColumn("canonical_url", canonical_url(F.col("url")))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["canonical_url"])
            .drop("canonical_url")
        )
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


def signed_pages(stream: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """Attach minhash/simhash signatures in-stream (same vectorized UDFs as
    batch, so signatures are byte-identical across modes)."""
    cfg = cfg or DedupConfig()
    return stream.withColumn("minhash", minhash_udf(cfg)(F.col("text"))).withColumn(
        "simhash", _simhash_udf(F.col("text"))
    )


def crawl_stats(stream: DataFrame, watermark: str = "1 hour", window: str = "10 minutes") -> DataFrame:
    """Event-time windowed crawl statistics (append-mode compatible)."""
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang",
            "n_pages",
            "avg_chars",
        )
    )
