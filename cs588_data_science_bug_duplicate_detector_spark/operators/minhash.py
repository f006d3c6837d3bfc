"""MinHash signatures + LSH banding + candidate-pair generation.

Replaces the reference's dense all-pairs similarity join
(``/root/reference/src/metrics.py:259-280`` — a matmul that cannot survive
10^12 docs) with: vectorized signature UDF -> band explode -> bucket
equi-join -> estimated-Jaccard verify. The similarity matrix is never
materialized (SURVEY.md J1).

Scale notes:
- signatures: one Arrow-batched pandas UDF, numpy segment reductions
  (functions/hashing.py) — the only Python hot path.
- banding: pure column exprs (slice + xxhash64), whole-stage codegen.
- bucket join: explicit repartition on (band_id, band_hash); hot buckets
  (boilerplate farms) are capped at cfg.bucket_cap with the drop LOGGED
  (a capped bucket of size c still yields c-1 star edges via its min
  member, so connectivity inside the bucket is preserved while the
  O(c^2) pair blowup is not).
- verify: estimated Jaccard from signature agreement — needs only the two
  128-slot signatures, no re-tokenization shuffle of full text.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..config import DedupConfig
from ..functions import hashing


def minhash_udf(cfg: DedupConfig):
    shingle_k, num_perm, seed = cfg.shingle_k, cfg.num_perm, cfg.seed
    char_mode = cfg.shingle_mode == "char"

    def _minhash_batch(texts: pd.Series) -> pd.Series:
        a, b = hashing.minhash_perms(num_perm, seed)
        if char_mode:
            # k-char sliding shingles (CJK/unsegmented scripts)
            flat, offsets = hashing.char_segments(texts, shingle_k)
            sig = hashing.minhash_signatures_from_segments(
                flat, offsets, len(texts), a, b
            )
            empty = texts.fillna("").str.strip().str.len() == 0
        else:
            toks = hashing.tokenize_series(texts)
            sig = hashing.minhash_signatures(texts, shingle_k, a, b, token_lists=toks)
            empty = toks.str.len() == 0
        out = pd.Series(list(sig))
        # content-less docs (null/blank text -> zero tokens) get a NULL
        # signature: all of them share one degenerate signature otherwise,
        # which collides in EVERY band, auto-accepts, and welds every
        # failed extraction on earth into one mega-cluster. band_table
        # drops NULL sigs; such docs stay singletons.
        out[empty.to_numpy()] = None
        return out

    return pandas_udf(_minhash_batch, ArrayType(LongType()))


def with_minhash(df: DataFrame, text_col: str, cfg: DedupConfig, out_col: str = "minhash") -> DataFrame:
    return df.withColumn(out_col, minhash_udf(cfg)(F.col(text_col)))


def with_dual_signatures(df: DataFrame, text_col: str, cfg: DedupConfig) -> DataFrame:
    """Add BOTH ``minhash`` and ``simhash`` columns in ONE Arrow pass.

    One UDF = one JVM->Python text transfer and one tokenization shared by
    both kernels — the signature phase is the throughput driver at 10^12
    docs, and two separate UDFs paid the text shuffle + tokenize twice.
    """
    shingle_k, num_perm, seed = cfg.shingle_k, cfg.num_perm, cfg.seed

    def _dual_batch(texts: pd.Series) -> pd.DataFrame:
        a, b = hashing.minhash_perms(num_perm, seed)
        toks = hashing.tokenize_series(texts)
        mh, sh = hashing.dual_signatures(texts, shingle_k, a, b, token_lists=toks)
        out = pd.DataFrame({"minhash": list(mh), "simhash": sh})
        # zero-token docs: NULL both signatures (see minhash_udf)
        empty = (toks.str.len() == 0).to_numpy()
        out.loc[empty, "minhash"] = None
        out["simhash"] = out["simhash"].astype("object")
        out.loc[empty, "simhash"] = None
        return out

    udf = pandas_udf(_dual_batch, "minhash array<long>, simhash long")
    return (
        df.withColumn("_sig", udf(F.col(text_col)))
        .withColumn("minhash", F.col("_sig.minhash"))
        .withColumn("simhash", F.col("_sig.simhash"))
        .drop("_sig")
    )


def band_table(sigs: DataFrame, id_col: str, cfg: DedupConfig, sig_col: str = "minhash",
               string_keys: bool = False, keep_cols: tuple = ()) -> DataFrame:
    """(id, band_key): one row per band per doc, JVM-side only.

    band_key folds the band index INTO the hash (xxhash64(band_id, slice)),
    so every downstream shuffle/join/group keys on a single long instead of
    (int, long) — ~30% less key bandwidth on the hottest table in the job.
    Cross-band collisions need a 64-bit hash collision: negligible.

    ``string_keys=True`` emits the verbatim key ``"<band>:<s0>,<s1>,..."``
    instead — the portable/oracle mode, reproduced exactly by the DuckDB
    SQL in functions/portable.py (DuckDB has no xxhash64). Semantically
    identical grouping; only the key encoding differs.
    """
    if string_keys:
        key = lambda b: F.concat_ws(
            ":",
            b.cast("string"),
            F.array_join(
                F.slice(F.col(sig_col), b * F.lit(cfg.rows_per_band) + 1, cfg.rows_per_band), ","
            ),
        )
    else:
        key = lambda b: F.xxhash64(
            b,
            F.slice(F.col(sig_col), b * F.lit(cfg.rows_per_band) + 1, cfg.rows_per_band),
        )
    bands = F.transform(F.sequence(F.lit(0), F.lit(cfg.bands - 1)), key)
    # NULL signatures = content-less docs (zero tokens): never candidates
    return (
        sigs.where(F.col(sig_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(bands).alias("band_key"),
            *keep_cols,  # e.g. the event-time column for streaming TTL
        )
    )


def capped_band_table(bands: DataFrame, cfg: DedupConfig) -> DataFrame:
    """One window pass over the band table: + bucket_size, + root (min id)
    per bucket. The cap split, the hot-bucket star edges, and the pair
    self-join all derive from this single shuffled table.

    Measured-and-rejected alternative (round 5, 1M docs, local[32]):
    ``groupBy(band_key).agg(collect_list(id))`` + JVM-side pair-combination
    explode replaces window+self-join with one aggregation — 29.3s vs 36.9s
    for the full detect tail, bit-identical edge set. Rejected because it
    materializes each bucket as ONE in-memory array in a single aggregation
    state: a pathological bucket at the 10^12-doc design point (a parked-
    domain template with 10^9 members = an 8 GB array) OOMs the executor,
    while WindowExec's ExternalAppendOnlyUnsafeRowArray spills the same
    partition to disk and finishes. The window path trades ~20% of one
    phase at bench scale for surviving the exact skew this module exists
    to handle (see BENCH/BASELINE.md round-5 skew stress) — and the
    singleton-bucket filter applied at this window's output (see
    ``minhash_edges_from_sigs``) then beat the rejected shape outright
    (21.3s vs its 29.3s) with the robustness kept."""
    from pyspark.sql import Window

    w = Window.partitionBy("band_key")
    return bands.withColumn("bucket_size", F.count("*").over(w)).withColumn(
        "root", F.min("id").over(w)
    )


def candidate_pairs(bands: DataFrame, cfg: DedupConfig, num_partitions: int | None = None) -> DataFrame:
    """Bucket equi-join -> (src < dst, n_bands) candidate pairs.

    ``n_bands`` (how many of the 32 bands collided) is a free by-product of
    the dedup aggregation and doubles as a coarse similarity estimate:
    P(band collision) = J^rows_per_band.
    """
    if num_partitions:
        bands = bands.repartition(num_partitions, "band_key")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band_key"])
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .agg(F.count("*").alias("n_bands"))
    )


def estimated_jaccard_col(sig_a, sig_b, num_perm: int):
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.lit(float(num_perm))


def verify_pairs(pairs: DataFrame, sigs: DataFrame, id_col: str, cfg: DedupConfig,
                 sig_col: str = "minhash") -> DataFrame:
    """Attach estimated Jaccard; keep pairs >= cfg.verify_threshold.

    Signatures travel through the two joins as array<int> (low 31 bits per
    slot — 0x7FFFFFFF so the value fits a signed int under ANSI casting):
    equality of full slots implies equality of the truncation, and a false
    31-bit agreement (~2^-31/slot) shifts the 128-slot estimate by < 1e-7
    — while halving the largest shuffle payload in the verify phase.
    """
    s = sigs.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(sig_col), lambda x: x.bitwiseAND(F.lit(0x7FFFFFFF)).cast("int")).alias("sig"),
    )
    scored = (
        pairs.join(s.withColumnRenamed("sig", "sig_a"), pairs.src == s.id)
        .drop("id")
        .join(s.withColumnRenamed("sig", "sig_b"), pairs.dst == F.col("id"))
        .drop("id")
        .withColumn("est_jaccard", estimated_jaccard_col(F.col("sig_a"), F.col("sig_b"), cfg.num_perm))
        .select("src", "dst", "est_jaccard")
    )
    return scored.where(F.col("est_jaccard") >= cfg.verify_threshold)


def hot_bucket_stats(hot: DataFrame) -> dict:
    """Summarize the hot-bucket table for stage lineage metrics. Cheap when
    the underlying band table is still persisted — call BEFORE
    release_cached_deps."""
    row = hot.agg(
        F.count("*").alias("hot_buckets"),
        F.coalesce(F.sum("bucket_size"), F.lit(0)).alias("rows_in_hot_buckets"),
        F.coalesce(F.max("bucket_size"), F.lit(0)).alias("max_bucket_size"),
    ).collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


# Safety net for the ``_cached_deps`` contract: the attribute is a dynamic
# field, so ANY derivation (``edges.select(...)``, ``.filter(...)``) returns
# a new DataFrame without it — a caller who keeps only the derived frame can
# never release the persisted band/pair tables, and cacheManager holds them
# by strong reference for the session's lifetime. Every attach therefore
# also registers (weakref-to-owner, deps) here; ``sweep_orphaned_deps``
# unpersists deps whose owner was garbage-collected unreleased.
import weakref as _weakref

_DEPS_REGISTRY: dict[int, tuple] = {}


def _attach_deps(df: DataFrame, deps: list) -> DataFrame:
    stale = _DEPS_REGISTRY.get(id(df))
    if stale is not None and stale[0]() is None:
        # id() reuse after GC: release the dead owner's deps before overwriting
        for dep in stale[1]:
            try:
                dep.unpersist()
            except Exception:
                pass
    df._cached_deps = deps
    _DEPS_REGISTRY[id(df)] = (_weakref.ref(df), list(deps))
    return df


def release_cached_deps(df: DataFrame) -> None:
    """Unpersist the intermediate DataFrames a builder attached to ``df``.

    Call AFTER materializing ``df`` (checkpoint write / count / collect) —
    long-lived sessions (bench loops, multi-split pipelines) otherwise
    accumulate cached band/pair blocks until LRU pressure.
    """
    entry = _DEPS_REGISTRY.pop(id(df), None)
    deps = entry[1] if entry is not None else getattr(df, "_cached_deps", [])
    for dep in deps:
        try:
            dep.unpersist()
        except Exception:
            pass


def sweep_orphaned_deps() -> int:
    """Unpersist deps whose owner DataFrame was GC'd without
    ``release_cached_deps`` (the attribute contract is easy to drop — see
    ``_DEPS_REGISTRY``). Returns the number of owners swept. Cheap; safe to
    call at any pipeline/bench quiescent point."""
    swept = 0
    for k in list(_DEPS_REGISTRY):
        ref, deps = _DEPS_REGISTRY[k]
        if ref() is None:
            for dep in deps:
                try:
                    dep.unpersist()
                except Exception:
                    pass
            del _DEPS_REGISTRY[k]
            swept += 1
    return swept


def minhash_edges_from_sigs(sigs: DataFrame, id_col: str, cfg: DedupConfig,
                            num_partitions: int | None = None,
                            string_keys: bool = False) -> tuple[DataFrame, DataFrame]:
    """sigs(id, minhash) -> (verified edges(src,dst), hot_bucket_summary).

    Edges include min-member star edges for capped hot buckets, so recall
    survives the cap. The returned edges carry ``_cached_deps`` (the
    persisted band/pair tables) — callers should ``release_cached_deps``
    after materializing.

    Plan shape: ONE window pass over the band table computes bucket size
    and bucket root together (count/min over partitionBy(band_key)), so
    the cap split, the star edges, and the pair self-join all read the
    same shuffled+persisted table — no separate size aggregation, no
    driver-side broadcast barrier, and the self-join is co-partitioned on
    band_key. (The earlier groupBy-sizes + broadcast-anti-join shape cost
    ~3 extra stage barriers per run; per-phase profiling showed those
    fixed costs were the main drag on N->4N scaling efficiency.)
    """
    # Persist the signature table: it feeds THREE plan branches (band
    # explode + the two verify joins), and without a persist each branch
    # re-runs the Arrow signature UDF over the full corpus — the most
    # expensive per-row work in the detector, paid 3x instead of 1x.
    # Released with the other deps via release_cached_deps.
    sigs = sigs.persist()
    bands = band_table(sigs, id_col, cfg, string_keys=string_keys)
    if num_partitions:
        bands = bands.repartition(num_partitions, "band_key")
    # singleton buckets can produce no pair, no star edge, and no hot row —
    # drop them right at the window output, BEFORE the persist and the
    # self-join. At 1M docs half the 32M band rows are singletons and the
    # detect tail went 36.9s -> 21.3s (-42%) with a bit-identical edge set;
    # the win only grows with corpus uniqueness. The window itself still
    # sees every row (sizes must count singletons) and keeps its spill-safe
    # ExternalAppendOnlyUnsafeRowArray behavior on pathological buckets.
    bw = (
        capped_band_table(bands, cfg)
        .where(F.col("bucket_size") >= 2)
        .persist()
    )
    ok = bw.where(F.col("bucket_size") <= cfg.bucket_cap).select("band_key", "id")
    hot = (
        bw.where(F.col("bucket_size") > cfg.bucket_cap)
        .select("band_key", "bucket_size")
        .distinct()
    )
    # hot-bucket star edges: linear in bucket size, verified like any pair
    star = (
        bw.where((F.col("bucket_size") > cfg.bucket_cap) & (F.col("id") != F.col("root")))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
        .distinct()
    )
    # explicit salting of skewed buckets (cfg.bucket_salt > 1): hot-bucket
    # members also pair within id-hashed sub-buckets — ~c^2/salt verified
    # pairs per hot bucket recover member<->member recall the star-only
    # path trades away; the salted self-join is co-partitioned on the
    # salted key, never on the raw hot band_key
    if cfg.bucket_salt > 1:
        salted = bw.where(F.col("bucket_size") > cfg.bucket_cap).select(
            F.xxhash64("band_key", F.pmod(F.xxhash64("id"), F.lit(cfg.bucket_salt))).alias(
                "band_key"
            ),
            "id",
        )
        sp = (
            salted.alias("a")
            .join(salted.alias("b"), "band_key")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .distinct()
        )
        star = star.unionByName(sp)
    # persist: the auto/ambiguous split reads the pair table twice — without
    # it the whole LSH bucket join runs twice.
    pairs = candidate_pairs(ok, cfg).persist()
    # hybrid verify: high-band-match pairs (the quadratic bulk — exact dups,
    # template farms) are accepted outright; only the statistically ambiguous
    # low-match tail pays the signature-join shuffle.
    auto = pairs.where(F.col("n_bands") >= cfg.auto_accept_bands).select("src", "dst")
    ambiguous = pairs.where(F.col("n_bands") < cfg.auto_accept_bands).select("src", "dst")
    verified = verify_pairs(
        ambiguous.unionByName(star), sigs, id_col, cfg
    ).select("src", "dst")
    edges = _attach_deps(auto.unionByName(verified).distinct(), [sigs, bw, pairs])
    return edges, hot


def minhash_edges(docs: DataFrame, id_col: str, text_col: str, cfg: DedupConfig,
                  num_partitions: int | None = None) -> tuple[DataFrame, DataFrame]:
    """Full detector-1 dataflow: docs -> verified candidate edges."""
    sigs = with_minhash(docs.select(id_col, text_col), text_col, cfg)
    return minhash_edges_from_sigs(sigs, id_col, cfg, num_partitions)
