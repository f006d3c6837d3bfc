"""Exact-duplicate detection: hash-groupBy, star edges to the min member.

The cheap pre-pass: identical text collapses via one md5 groupBy instead
of flowing through LSH. Emits (min_member -> other) star edges that union
into the connected-components input, so exact-dup clusters compose with
near-dup clusters sharing members.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import _nonblank


def text_hash_col(text_col: str):
    return F.md5(F.col(text_col).cast("binary"))


def _has_content(text_col: str):
    """Content-less docs (NULL or whitespace-only text) are never dup
    candidates: md5(NULL) is NULL and NULL keys GROUP TOGETHER in Spark,
    so without this filter every failed extraction in the corpus would
    merge into one cluster. "No content" is not "same content".

    Uses ``_nonblank`` (regex strip of ALL whitespace), not ``F.trim``:
    trim() removes only ASCII spaces, so '\\n'-only docs — the common
    output of a failed HTML extraction — would pass a trim-based check
    and weld every failed extraction into one md5('\\n') mega-cluster."""
    return _nonblank(F.col(text_col))


def exact_dup_edges(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # min-over-window instead of groupBy+join-back: one shuffle, one stage
    h = docs.where(_has_content(text_col)).select(
        F.col(id_col).alias("id"), text_hash_col(text_col).alias("h")
    )
    root = F.min("id").over(Window.partitionBy("h"))
    return (
        h.withColumn("root", root)
        .where(F.col("id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
    )


def exact_dup_groups(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, n_copies, canonical_id) for groups with >1 copy."""
    h = docs.where(_has_content(text_col)).select(
        F.col(id_col).alias("id"), text_hash_col(text_col).alias("text_hash")
    )
    return (
        h.groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("id").alias("canonical_id"))
        .where(F.col("n_copies") > 1)
    )
