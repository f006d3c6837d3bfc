"""Exact n-gram Jaccard similarity join — SQL-expressible near-dup scoring.

The fully-relational cousin of the MinHash detector: explode distinct
token n-grams, self-join on the n-gram, count intersections, compute
|A∩B| / (|A|+|B|-|A∩B|). Quadratic in co-bucket sizes, so it's the
verification/oracle path, not the 10^12-doc path — but it's pure
DataFrame ops with a line-for-line DuckDB SQL equivalent, which makes it
the correctness anchor for the hash-based detectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def ngram_col(text_col: str, n: int):
    """array<string> of distinct token n-grams (JVM expression)."""
    toks = tokens(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array())
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    group_col: str | None = None,
) -> DataFrame:
    """(src, dst, jaccard) for pairs with n-gram Jaccard >= threshold.

    ``group_col`` (e.g. lang) restricts the join space — pairs across
    groups are never candidates.
    """
    cols = [F.col(id_col).alias("id"), ngram_col(text_col, n).alias("grams")]
    if group_col:
        cols.append(F.col(group_col).alias("g"))
    base = docs.select(*cols).withColumn("n_grams", F.size("grams"))
    # join on xxhash64(gram), not the gram string: ~5x less key bandwidth on
    # the explode-join shuffle (8-byte longs vs ~20-40 byte strings). A
    # 64-bit collision between two DISTINCT grams of a doc pair overstates
    # the intersection by 1 — odds ~ (grams-per-doc)^2 / 2^64, negligible.
    exploded = base.select(
        "id",
        "n_grams",
        *(["g"] if group_col else []),
        F.explode(F.transform("grams", lambda s: F.xxhash64(s))).alias("gram"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    join_keys = ["gram"] + (["g"] if group_col else [])
    inter = (
        a.join(b, join_keys)
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .agg(
            F.count("*").alias("n_inter"),
            F.first(F.col("a.n_grams")).alias("na"),
            F.first(F.col("b.n_grams")).alias("nb"),
        )
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", "jaccard")
    )
