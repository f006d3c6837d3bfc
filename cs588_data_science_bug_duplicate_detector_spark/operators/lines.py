"""Line-level boilerplate removal + intra-doc repetition stats.

The two line-granularity cleaners every web-corpus training pipeline runs
before document-level dedup (C4 / CCNet remove lines shared across many
pages — nav bars, cookie banners, copyright footers; Gopher gates docs on
intra-document repetition). No counterpart in the reference (documents
there are single-field bug reports); specified by the brief's
training-data-pipeline operator list.

Spark shape (all pure Catalyst, no UDFs):

- ``split_lines``: posexplode over ``split(text, '\\n')`` keeps a 0-based
  line index for order-preserving reconstruction.
- ``boilerplate_keys``: one groupBy over the line hash with a
  countDistinct(doc) HAVING — the heavy-hitter set. Keyed on
  md5(stripped line) so the DuckDB oracle can recompute it verbatim;
  production could swap xxhash64 for half the key bytes, same plan.
- ``remove_boilerplate``: lines LEFT-join the (small, AQE-broadcastable)
  heavy-hitter set, then ONE groupBy per doc rebuilds the cleaned text
  with ``array_sort(collect_list(struct(pos, line)))`` — order restored
  inside the row, no window needed. Docs re-attach by a left join so
  NULL-text docs survive with NULL clean_text (and fully-boilerplate
  docs with '').

Scale notes: two shuffles over the exploded lines (heavy-hitter count +
per-doc rebuild) and one over docs. The heavy-hitter set is the
HAVING-filtered aggregate — zipfian line frequency keeps it small
relative to the corpus, and AQE picks a broadcast join when it fits; a
count threshold that scales with corpus size keeps its growth sublinear.
Blank (whitespace-only) lines are never counted as boilerplate and never
removed — they carry document structure, not content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import _strip


def split_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line, key, counted): one row per line of non-NULL-text
    docs; ``key`` = md5(whitespace-stripped line), ``counted`` = False for
    blank lines (excluded from boilerplate frequency counting)."""
    stripped = _strip(F.col("line"))
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
        .withColumn("key", F.md5(stripped.cast("binary")))
        .withColumn("counted", stripped != "")
    )


def boilerplate_keys(lines: DataFrame, min_docs: int) -> DataFrame:
    """Line keys appearing in >= min_docs distinct docs (blank lines never)."""
    return (
        lines.where("counted")
        .groupBy("key")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("key")
    )


def remove_boilerplate(
    docs: DataFrame, id_col: str, text_col: str, min_docs: int = 10
) -> DataFrame:
    """(id, clean_text, n_lines, n_removed) per doc.

    ``clean_text`` is the original lines minus corpus-boilerplate ones,
    original order and intra-line bytes preserved; NULL for NULL-text
    docs, '' when every line was boilerplate.
    """
    lines = split_lines(docs, id_col, text_col)
    boiler = boilerplate_keys(lines, min_docs).withColumn("removed", F.lit(True))
    flagged = lines.join(boiler, "key", "left").withColumn(
        "removed", F.coalesce("removed", F.lit(False))
    )
    rebuilt = flagged.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("removed"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    return (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.when(F.col("_text").isNotNull(), F.coalesce("clean_text", F.lit(""))).alias(
                "clean_text"
            ),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def repetition_stats(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-doc repetition: (id, n_lines, dup_line_frac,
    dup_char_frac) over non-blank lines.

    - ``dup_line_frac``: fraction of non-blank lines whose (stripped)
      content occurs more than once within the doc.
    - ``dup_char_frac``: fraction of those lines' characters (stripped
      length, counted with multiplicity) over all non-blank line chars.

    NULL-text and all-blank docs report 0 lines and 0.0 fractions. One
    groupBy per (doc, line-key), one per doc — two shuffles total.
    """
    lines = split_lines(docs, id_col, text_col).where("counted")
    per_key = lines.groupBy("id", "key").agg(
        F.count("*").alias("cnt"),
        F.first(F.length(_strip(F.col("line")))).alias("line_len"),
    )
    stats = per_key.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("n_dup"),
        F.sum(F.col("cnt") * F.col("line_len")).alias("n_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("line_len")).otherwise(0)
        ).alias("n_dup_chars"),
    )
    frac = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.col(num).cast("double") / F.col(den).cast("double")
    ).otherwise(F.lit(0.0))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            "id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(frac("n_dup", "n_lines"), 6).alias("dup_line_frac"),
            F.round(frac("n_dup_chars", "n_chars"), 6).alias("dup_char_frac"),
        )
    )
