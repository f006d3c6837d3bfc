"""64-bit SimHash + Hamming-neighborhood candidate generation.

Detector 2 (north_star): near-identical pages (tiny body diffs on a huge
shared template). Candidate generation uses the pigeonhole principle:
split the 64-bit signature into ``cfg.simhash_chunks`` equal chunks; any
pair within Hamming distance <= chunks-1 must agree on at least one chunk,
so an equi-join per chunk has perfect recall for the target radius.
Verification is a JVM-side popcount on XOR — no Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..config import DedupConfig
from ..functions import hashing


@pandas_udf(LongType())
def _simhash_udf(texts: pd.Series) -> pd.Series:
    toks = hashing.tokenize_series(texts)
    out = pd.Series(hashing.simhash_signatures(texts, token_lists=toks)).astype("object")
    # zero-token docs: NULL signature (all of them hash to the same
    # degenerate value otherwise and the chunk join welds them together);
    # chunk_table drops NULLs, so content-less docs stay singletons
    out[(toks.str.len() == 0).to_numpy()] = None
    return out


def with_simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, _simhash_udf(F.col(text_col)))


def chunk_table(sigs: DataFrame, id_col: str, cfg: DedupConfig, sig_col: str = "simhash") -> DataFrame:
    """(id, chunk_id, chunk_val) — one row per 16-bit chunk per doc."""
    width = cfg.simhash_bits // cfg.simhash_chunks
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned(F.col(sig_col), i * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for i in range(cfg.simhash_chunks)
        ]
    )
    return (
        sigs.where(F.col(sig_col).isNotNull())  # content-less docs: never candidates
        .select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"), F.explode(chunks).alias("c"))
        .select("id", "sig", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk_val").alias("chunk_val"))
    )


def simhash_edges_from_sigs(sigs: DataFrame, id_col: str, cfg: DedupConfig,
                            num_partitions: int | None = None,
                            stats_out: dict | None = None) -> DataFrame:
    """sigs(id, simhash) -> verified Hamming<=cfg.simhash_hamming_max edges (src < dst).

    Hot chunk buckets (boilerplate farms: hundreds of near-identical pages
    agreeing on a 16-bit chunk) are capped like LSH buckets: min-member star
    edges, Hamming-verified, linear instead of quadratic. Pass ``stats_out``
    to surface the cap as lineage metrics (hot chunk count / capped rows /
    max bucket) — computed from the persisted chunk table, no extra scan.
    """
    from pyspark.sql import Window

    chunks = chunk_table(sigs, id_col, cfg)
    if num_partitions:
        chunks = chunks.repartition(num_partitions, "chunk_id", "chunk_val")
    # one window pass: bucket size + bucket root (min id, with its sig for
    # the Hamming verify) over the chunk key — no size aggregation round
    # trip, no broadcast barrier; the self-join below is co-partitioned
    w = Window.partitionBy("chunk_id", "chunk_val")
    cw = (
        chunks.withColumn("n", F.count("*").over(w))
        .withColumn("r", F.min(F.struct("id", "sig")).over(w))
        # singleton chunk buckets emit nothing (no pair, star, or hot row):
        # drop them before the persist + self-join — same measured win as
        # the LSH band path (operators/minhash.py, detect tail -33%)
        .where(F.col("n") >= 2)
        .persist()
    )
    if stats_out is not None:
        row = (
            cw.where(F.col("n") > cfg.simhash_chunk_cap)
            .select("chunk_id", "chunk_val", "n")
            .distinct()
            .agg(
                F.count("*").alias("hot_chunks"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("rows_in_hot_chunks"),
                F.coalesce(F.max("n"), F.lit(0)).alias("max_chunk_size"),
            )
            .collect()[0]
        )
        stats_out.update({k: int(row[k]) for k in row.asDict()})
    ok = cw.where(F.col("n") <= cfg.simhash_chunk_cap).select("chunk_id", "chunk_val", "id", "sig")
    ham = F.expr("bit_count(a.sig ^ b.sig)")
    a = ok.alias("a")
    b = ok.alias("b")
    joined = (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("a.id") < F.col("b.id"))
        .where(ham <= F.lit(cfg.simhash_hamming_max))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    star = (
        cw.where((F.col("n") > cfg.simhash_chunk_cap) & (F.col("id") != F.col("r.id")))
        .where(F.expr("bit_count(sig ^ r.sig)") <= F.lit(cfg.simhash_hamming_max))
        .select(F.col("r.id").alias("src"), F.col("id").alias("dst"))
    )
    from .minhash import _attach_deps

    # release via minhash.release_cached_deps after materializing
    edges = _attach_deps(joined.unionByName(star).distinct(), [cw])
    return edges


def simhash_edges(docs: DataFrame, id_col: str, text_col: str, cfg: DedupConfig,
                  num_partitions: int | None = None) -> DataFrame:
    """docs -> verified Hamming<=cfg.simhash_hamming_max edges (src < dst)."""
    sigs = with_simhash(docs.select(id_col, text_col), text_col)
    return simhash_edges_from_sigs(sigs, id_col, cfg, num_partitions)
