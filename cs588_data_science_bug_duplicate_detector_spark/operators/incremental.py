"""Incremental dedup: fold a new crawl increment into an existing corpus
index without re-pairing the old corpus against itself.

The reference recomputes its duplicate structure from scratch on every
run (``/root/reference/preprocess_data.py`` rebuilds the full pair set);
at web scale the corpus is append-mostly — a daily crawl adds ~0.1% new
documents — and re-running old-vs-old discovery is 99.8% wasted work.
This module maintains a persisted index (MinHash + SimHash signatures +
exact-text md5 per doc — the full production detector set — plus current
cluster labels) and, per increment:

1. signs ONLY the new documents (one Arrow pass — the Python hot path is
   proportional to the increment, never the corpus);
2. discovers candidate pairs with >= 1 NEW endpoint: new band keys /
   simhash chunk keys / text md5s are joined against the stored index,
   and because all three key families are pure functions of
   content+config, an old bucket that contains no new member cannot
   produce a new pair — those buckets are dropped by a key semi-join
   before any pairing happens;
3. folds the new verified edges into the previous labels: old clusters
   enter connected-components as star edges (cluster_id -> member), so
   the CC input is O(|old docs| + |new edges|), not O(all edges ever).

Scale notes (the 1000-executor story):
- Per-increment Python/signature cost: O(|increment|). Old docs are
  never re-tokenized or re-hashed in Python; their band keys are
  re-derived JVM-side from the stored 128-slot signatures (xxhash64 over
  array slices — whole-stage codegen over a columnar scan that prunes to
  the (id, minhash) columns).
- The band-key semi-join shuffles old bands once per increment. With AQE
  + runtime bloom-filter join (Spark 3.3+,
  ``spark.sql.optimizer.runtime.bloomFilter.enabled``) the new side's
  band-key set is pushed into the old-side scan, so the shuffled volume
  approaches only the TOUCHED buckets. For small daily increments the
  stored signature table can additionally be bucketed by band-key prefix
  (Iceberg bucket transform) to skip the shuffle entirely; the Parquet
  backend here keeps the seam simple.
- Hot buckets obey the same ``bucket_cap`` discipline as the batch path:
  capped buckets contribute star edges to the bucket root (linear, not
  quadratic), and ONLY new members (plus one bridge edge when the root
  itself is new) are emitted — old members' intra-bucket connectivity is
  already captured by the carried labels.
- Labels-as-star-edges keeps the CC input shallow: the previous
  partition collapses to one edge per non-root member, so incremental CC
  converges in ~2 rounds regardless of how many increments accumulated.

Correctness contract (pytest + driver ``incremental_dedup`` query): the
final incremental partition equals a from-scratch batch run (exact ∪
MinHash ∪ SimHash edges, CC) over the concatenated corpus. Band keys and
text hashes depend only on (content, config), so candidate discovery is
corpus-composition-independent; the equality is asserted end-to-end on
planted cross-increment duplicates.

One declared asymmetry: hot-bucket CAP truncation is history-dependent.
A bucket that was under ``bucket_cap`` in an earlier run had its pairs
fully verified then; if later increments push it over the cap, a
from-scratch run would keep only root-star edges while the fold retains
the previously-verified member<->member edges through the carried
labels. The fold therefore preserves AT LEAST the connectivity of the
batch run's verify outcomes — it can only differ by keeping old true
positives the batch cap would have truncated (the batch path documents
the same recall trade for its own caps). On corpora where no bucket
crosses a cap between folds — including the pytest fixtures and the
driver's sf0.001/sf0.01 corpora — the partitions are exactly equal.
Observed boundary case (round 6): at sf0.1 ONE simhash chunk bucket
(131 members vs chunk_cap=128) crosses the cap across increments, and
the fold keeps one true Hamming<=3 pair (doc 4113) that the batch
star-cap drops — exactly the declared direction (fold ⊇ batch
connectivity, extra edge is a verified true positive).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.text import _nonblank
from .cc import connected_components
from .minhash import (
    _attach_deps,
    band_table,
    release_cached_deps,
    minhash_edges_from_sigs,
    verify_pairs,
    with_dual_signatures,
    with_minhash,
)
from .simhash import chunk_table, simhash_edges_from_sigs, with_simhash


def _signed_increment(docs: DataFrame, id_col: str, text_col: str,
                      cfg: DedupConfig) -> DataFrame:
    """(id, minhash, simhash, text_md5): everything the index stores per
    doc — both hash signatures come from ONE Arrow pass
    (``with_dual_signatures``: one JVM->Python text transfer, one shared
    tokenization).

    ``text_md5`` is NULL for content-less docs (NULL/whitespace text) for
    the same reason ``exact_dup_edges`` filters them: "no content" must
    never group as "same content".
    """
    if cfg.shingle_mode == "char":
        # char-shingle MinHash (CJK/unsegmented scripts) — the dual-pass
        # kernel is token-only, so compute each signature with the SAME
        # kernels the batch detectors use (SimHash stays token-based in
        # the batch path too); stored signatures must be bit-identical to
        # what a from-scratch run computes or the equality contract breaks
        sigs = with_simhash(
            with_minhash(docs.select(id_col, text_col), text_col, cfg), text_col
        )
    else:
        sigs = with_dual_signatures(docs.select(id_col, text_col), text_col, cfg)
    return sigs.select(
        F.col(id_col).alias("id"),
        "minhash",
        "simhash",
        F.when(_nonblank(F.col(text_col)), F.md5(F.col(text_col).cast("binary")))
        .alias("text_md5"),
    )


def incremental_minhash_edges(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    cfg: DedupConfig,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Verified LSH edges with >= 1 new endpoint, plus hot-bucket summary.

    Mirrors ``minhash_edges_from_sigs`` (same window-pass cap/root shape,
    same hybrid auto-accept/verify split) restricted to buckets touched
    by the increment. Old-vs-old pairs are excluded BY CONSTRUCTION — the
    previous run already adjudicated them and their verdict rides in via
    the carried labels.
    """
    new_bands = band_table(new_sigs, "id", cfg).withColumn("is_new", F.lit(True))
    old_bands = band_table(old_sigs, "id", cfg)
    # drop untouched old buckets before any window/pairing work: a bucket
    # with no new member cannot emit a new-endpoint pair
    touched_keys = new_bands.select("band_key").distinct()
    old_touched = old_bands.join(touched_keys, "band_key", "left_semi").withColumn(
        "is_new", F.lit(False)
    )
    combined = new_bands.unionByName(old_touched)
    if num_partitions:
        combined = combined.repartition(num_partitions, "band_key")
    w = Window.partitionBy("band_key")
    bw = (
        combined.withColumn("bucket_size", F.count("*").over(w))
        .withColumn("root", F.min("id").over(w))
        # the smallest OLD member: bridge target when the root is new
        .withColumn(
            "old_min", F.min(F.when(~F.col("is_new"), F.col("id"))).over(w)
        )
        # singleton buckets emit nothing (no pair, star, or hot row) —
        # drop them before the persist + pair join, same -42% detect-tail
        # win as the batch path (operators/minhash.py)
        .where(F.col("bucket_size") >= 2)
        .persist()
    )
    ok = bw.where(F.col("bucket_size") <= cfg.bucket_cap)
    hot = (
        bw.where(F.col("bucket_size") > cfg.bucket_cap)
        .select("band_key", "bucket_size")
        .distinct()
    )
    # capped buckets: star edges for NEW members; when the root is itself
    # new, ALSO star every OLD member to the new root — the from-scratch
    # run stars root->EVERY member with each edge individually verified,
    # so a single bridge edge could under-connect when only SOME old
    # members pass the root verify (old members' mutual connectivity is
    # already in the carried labels either way)
    hot_rows = bw.where(F.col("bucket_size") > cfg.bucket_cap)
    root_is_new = F.col("old_min").isNull() | (F.col("root") != F.col("old_min"))
    star = (
        hot_rows.where(F.col("is_new") & (F.col("id") != F.col("root")))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
        .unionByName(
            hot_rows.where(root_is_new & ~F.col("is_new"))
            .select(F.col("root").alias("src"), F.col("id").alias("dst"))
        )
        .distinct()
    )
    # explicit hot-bucket salting (cfg.bucket_salt > 1): same id-hashed
    # sub-bucket pairing as the batch path, restricted to >=1 new endpoint
    # (old-old salted pairs were generated by the run that first saw the
    # bucket hot, or fully verified while it was still under the cap)
    if cfg.bucket_salt > 1:
        salted = hot_rows.select(
            F.xxhash64(
                "band_key", F.pmod(F.xxhash64("id"), F.lit(cfg.bucket_salt))
            ).alias("band_key"),
            "id",
            "is_new",
        )
        sp = (
            salted.alias("a")
            .join(salted.alias("b"), "band_key")
            .where(
                (F.col("a.id") < F.col("b.id"))
                & (F.col("a.is_new") | F.col("b.is_new"))
            )
            .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
            .distinct()
        )
        star = star.unionByName(sp)
    a, b = ok.alias("a"), ok.alias("b")
    pairs = (
        a.join(b, ["band_key"])
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.is_new") | F.col("b.is_new"))
        )
        .groupBy(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .agg(F.count("*").alias("n_bands"))
        .persist()
    )
    auto = pairs.where(F.col("n_bands") >= cfg.auto_accept_bands).select("src", "dst")
    ambiguous = pairs.where(F.col("n_bands") < cfg.auto_accept_bands).select("src", "dst")
    # prune the signature side to the pair endpoints BEFORE the verify
    # joins: verify needs only ids appearing in a candidate pair, and the
    # endpoint-id set is O(touched) — small enough to broadcast for a
    # daily increment — while the stored signature table is the largest
    # payload in the job; without the semi-join every increment would
    # re-shuffle the whole corpus's 128-slot signatures
    cand = ambiguous.unionByName(star)
    endpoint_ids = (
        cand.select(F.col("src").alias("id"))
        .unionByName(cand.select(F.col("dst").alias("id")))
        .distinct()
    )
    all_sigs = (
        new_sigs.select("id", "minhash")
        .unionByName(old_sigs.select("id", "minhash"))
        .join(endpoint_ids, "id", "left_semi")
    )
    verified = verify_pairs(cand, all_sigs, "id", cfg).select("src", "dst")
    edges = _attach_deps(auto.unionByName(verified).distinct(), [bw, pairs])
    return edges, hot


def incremental_simhash_edges(
    new_sigs: DataFrame,
    old_sigs: DataFrame,
    cfg: DedupConfig,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hamming-verified SimHash edges with >= 1 new endpoint.

    Same touched-bucket discipline as the LSH fold, over the pigeonhole
    chunk keys (``simhash.chunk_table``): old chunks are semi-joined on
    the increment's (chunk_id, chunk_val) set before any window/pairing
    work; hot chunks emit Hamming-verified star edges for NEW members
    plus one bridge edge when the chunk root is itself new.
    """
    new_c = chunk_table(new_sigs, "id", cfg).withColumn("is_new", F.lit(True))
    old_c = chunk_table(old_sigs, "id", cfg)
    touched = new_c.select("chunk_id", "chunk_val").distinct()
    old_t = old_c.join(touched, ["chunk_id", "chunk_val"], "left_semi").withColumn(
        "is_new", F.lit(False)
    )
    combined = new_c.unionByName(old_t)
    if num_partitions:
        combined = combined.repartition(num_partitions, "chunk_id", "chunk_val")
    w = Window.partitionBy("chunk_id", "chunk_val")
    cw = (
        combined.withColumn("n", F.count("*").over(w))
        .withColumn("r", F.min(F.struct("id", "sig")).over(w))
        .withColumn(
            "om",
            F.min(F.when(~F.col("is_new"), F.struct("id", "sig"))).over(w),
        )
        .persist()
    )
    ok = cw.where(F.col("n") <= cfg.simhash_chunk_cap).select(
        "chunk_id", "chunk_val", "id", "sig", "is_new"
    )
    hmax = F.lit(cfg.simhash_hamming_max)
    a, b = ok.alias("a"), ok.alias("b")
    joined = (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.is_new") | F.col("b.is_new"))
        )
        .where(F.expr("bit_count(a.sig ^ b.sig)") <= hmax)
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
    )
    hot = cw.where(F.col("n") > cfg.simhash_chunk_cap)
    # new members star to the chunk root; when the root is itself new,
    # ALSO star every OLD member (each Hamming-verified) — a from-scratch
    # run stars root->every member, and per-edge verification means a
    # single bridge could under-connect (see the LSH fold)
    root_is_new = F.col("om").isNull() | (F.col("r.id") != F.col("om.id"))
    star = (
        hot.where(F.col("is_new") & (F.col("id") != F.col("r.id")))
        .where(F.expr("bit_count(sig ^ r.sig)") <= hmax)
        .select(F.col("r.id").alias("src"), F.col("id").alias("dst"))
        .unionByName(
            hot.where(root_is_new & ~F.col("is_new"))
            .where(F.expr("bit_count(sig ^ r.sig)") <= hmax)
            .select(F.col("r.id").alias("src"), F.col("id").alias("dst"))
        )
    )
    return _attach_deps(joined.unionByName(star).distinct(), [cw])


def incremental_exact_edges(new_hashes: DataFrame, old_hashes: DataFrame) -> DataFrame:
    """Exact-dup star edges with >= 1 new endpoint.

    Inputs are (id, text_md5); NULL hashes (content-less docs) never
    group. Same min-over-window shape as ``exact_dup_edges``, restricted
    to md5 groups touched by the increment.
    """
    new_h = new_hashes.where(F.col("text_md5").isNotNull()).withColumn(
        "is_new", F.lit(True)
    )
    touched = new_h.select("text_md5").distinct()
    old_h = (
        old_hashes.where(F.col("text_md5").isNotNull())
        .join(touched, "text_md5", "left_semi")
        .withColumn("is_new", F.lit(False))
    )
    w = Window.partitionBy("text_md5")
    rows = (
        new_h.unionByName(old_h)
        .withColumn("root", F.min("id").over(w))
        .withColumn("old_min", F.min(F.when(~F.col("is_new"), F.col("id"))).over(w))
    )
    return (
        rows.where(F.col("is_new") & (F.col("id") != F.col("root")))
        .select(F.col("root").alias("src"), F.col("id").alias("dst"))
        .unionByName(
            rows.where(
                F.col("is_new")
                & (F.col("id") == F.col("root"))
                & F.col("old_min").isNotNull()
            ).select(F.col("id").alias("src"), F.col("old_min").alias("dst"))
        )
        .distinct()
    )


def fold_labels(old_labels: DataFrame, new_edges: DataFrame,
                new_ids: DataFrame, **cc_kwargs) -> DataFrame:
    """(previous labels, new edges) -> updated labels over old + new ids.

    The previous partition enters CC as star edges (cluster_id ->
    member), so its contribution is one edge per non-root member — CC
    never re-reads historical edge sets and converges in ~2 rounds.
    """
    carried = old_labels.where(F.col("id") != F.col("cluster_id")).select(
        F.col("cluster_id").alias("src"), F.col("id").alias("dst")
    )
    vertices = old_labels.select("id").unionByName(new_ids.select("id")).distinct()
    return connected_components(
        carried.unionByName(new_edges.select("src", "dst")).distinct(),
        vertices=vertices,
        pre_deduped=True,
        **cc_kwargs,
    )


class DedupIndex:
    """Persisted incremental dedup index (Parquet layout).

    ::

        root/
          meta.json            config fingerprint + increment count
          sigs/inc=N/          (id, minhash, simhash, text_md5) per increment
          labels/v{N}/         full label snapshot after increment N

    ``meta.json`` is written LAST via atomic rename, so a crash mid-
    increment leaves the index readable at its previous state and the
    re-run simply overwrites the orphaned ``inc=N`` directory.

    Doc ids must be globally unique across increments (web-scale
    pipelines derive them from content/URL hashes, so this holds by
    construction; ``add_increment`` asserts it cheaply against the
    carried label count).
    """

    def __init__(self, root: str, cfg: DedupConfig | None = None,
                 use_simhash: bool = True):
        self.root = root
        self.cfg = cfg or DedupConfig()
        # the production detector set is exact ∪ MinHash ∪ SimHash; False
        # folds exact ∪ MinHash only (the flagship driver pair). Part of
        # the index identity — mixing detector sets across increments
        # breaks the inductive carried-labels invariant.
        self.use_simhash = use_simhash
        os.makedirs(root, exist_ok=True)

    # --- layout helpers ---
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def _sig_dir(self, n: int) -> str:
        return os.path.join(self.root, "sigs", f"inc={n}")

    def _label_dir(self, n: int) -> str:
        return os.path.join(self.root, "labels", f"v{n}")

    def meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {
                "n_increments": 0,
                "cfg_fp": self.cfg.fingerprint(),
                "use_simhash": self.use_simhash,
            }
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    # --- reads ---
    def signatures(self, spark: SparkSession, upto: int | None = None) -> DataFrame:
        """All stored (id, minhash, simhash, text_md5); ``upto`` bounds the
        increment index (exclusive) via partition pruning on ``inc``."""
        self._recover_compaction()
        df = spark.read.option("basePath", os.path.join(self.root, "sigs")).parquet(
            os.path.join(self.root, "sigs")
        )
        if upto is not None:
            df = df.where(F.col("inc") < upto)
        return df.select("id", "minhash", "simhash", "text_md5")

    def labels(self, spark: SparkSession) -> DataFrame:
        n = self.meta()["n_increments"]
        if n == 0:
            raise ValueError(f"empty index at {self.root}")
        return spark.read.parquet(self._label_dir(n - 1))

    def compact(self, spark: SparkSession, target_partitions: int | None = None) -> int:
        """Merge all completed increment dirs into one (``inc=0``).

        Daily increments leave one small parquet dir each; after a year
        the per-fold index scan opens ~365 directories of sub-optimal
        files (the classic small-files tax). Compaction rewrites every
        stored signature into a single staged directory, then swaps it in
        as ``inc=0`` and removes the others — ``meta.n_increments`` keeps
        counting upward (it is the NEXT write index, not a physical dir
        count; the ``inc < n`` partition filter still admits the merged
        dir). Returns the number of directories merged away.

        Crash contract (round-6 fix of the round-5 ADVICE finding): the
        delete/swap is WRITE-AHEAD LOGGED in meta.json. The staged merge
        is fully written (incl. _SUCCESS) BEFORE the intent is recorded,
        and only after the atomic intent write do source dirs go away —
        so a crash at ANY point leaves either (a) the original dirs
        intact (intent absent: the staged dir is garbage and is swept),
        or (b) a recorded intent that ``_recover_compaction`` — run at
        the top of every read/write entry point — finishes
        idempotently. A partial signature index is never readable.
        On an object store, still run compaction from a single
        maintenance job — renames are not atomic there.
        """
        self._recover_compaction()
        meta = self.meta()
        n = meta["n_increments"]
        existing = [
            i for i in range(n) if os.path.exists(self._sig_dir(i))
        ]
        if len(existing) <= 1:
            return 0
        staged = self._staged_dir
        shutil.rmtree(staged, ignore_errors=True)
        df = self.signatures(spark, upto=n)
        if target_partitions:
            df = df.repartition(target_partitions)
        df.write.mode("overwrite").parquet(staged)
        # WAL intent: the staged copy is complete; from here the swap can
        # always be finished (or re-finished) by _recover_compaction
        meta["compact"] = {"merged": existing}
        self._write_meta(meta)
        self._finish_compaction(meta)
        return len(existing) - 1

    @property
    def _staged_dir(self) -> str:
        return os.path.join(self.root, "sigs_compact_tmp")

    def _finish_compaction(self, meta: dict) -> None:
        """Complete a WAL-logged compaction: delete merged source dirs,
        swap the staged merge in as inc=0, clear the intent. Idempotent —
        safe to re-run from any crash point after the intent write."""
        staged = self._staged_dir
        merged = meta["compact"]["merged"]
        if os.path.exists(os.path.join(staged, "_SUCCESS")):
            for i in merged:
                if i != 0:
                    shutil.rmtree(self._sig_dir(i), ignore_errors=True)
            # inc=0 goes last, immediately before the swap, so the staged
            # copy (still intact) always covers a crash in between
            shutil.rmtree(self._sig_dir(0), ignore_errors=True)
            os.replace(staged, self._sig_dir(0))
        elif os.path.isdir(staged):
            raise RuntimeError(
                f"compaction staging dir {staged} exists without _SUCCESS "
                "while a compaction intent is recorded — refusing to guess; "
                "inspect the index manually"
            )
        else:
            # staged dir already swapped in (crash landed after os.replace,
            # before the intent clear): only stray source dirs remain
            for i in merged:
                if i != 0:
                    shutil.rmtree(self._sig_dir(i), ignore_errors=True)
        meta.pop("compact", None)
        self._write_meta(meta)

    def _recover_compaction(self) -> None:
        """Finish (or roll back) an interrupted compact(). Intent absent:
        any staged dir is pre-intent garbage — remove it, sources are
        untouched. Intent present: the staged copy was complete when the
        intent was recorded, so finishing is always safe."""
        meta = self.meta()
        if meta.get("compact"):
            self._finish_compaction(meta)
        else:
            shutil.rmtree(self._staged_dir, ignore_errors=True)

    # --- the one write path ---
    def add_increment(self, docs: DataFrame, id_col: str, text_col: str,
                      num_partitions: int | None = None,
                      cc_kwargs: dict | None = None) -> DataFrame:
        """Sign, pair, and fold one increment; returns the updated labels.

        Cost profile: Python/signature work O(|docs|); pairing touches
        only LSH buckets and md5 groups containing a new doc; CC input is
        carried-star-edges + new edges.

        ``cc_kwargs`` forwards to ``connected_components`` — pass
        ``{"reliable": True, "checkpoint_dir": ...}`` on a real cluster so
        executor loss mid-fold replays from the round checkpoint instead
        of restarting the CC loop (same knob the pipeline wires when a
        workdir is present).
        """
        cc_kwargs = cc_kwargs or {}
        spark = docs.sparkSession
        self._recover_compaction()
        meta = self.meta()
        if meta["cfg_fp"] != self.cfg.fingerprint():
            raise ValueError(
                "config fingerprint mismatch: index was built with a different "
                f"DedupConfig ({meta['cfg_fp']} != {self.cfg.fingerprint()})"
            )
        if meta.get("use_simhash", True) != self.use_simhash:
            raise ValueError(
                "detector-set mismatch: index was built with "
                f"use_simhash={meta.get('use_simhash', True)}"
            )
        n = meta["n_increments"]
        _signed_increment(docs, id_col, text_col, self.cfg).write.mode(
            "overwrite"
        ).parquet(self._sig_dir(n))
        new_sigs = spark.read.parquet(self._sig_dir(n))
        new_ids = new_sigs.select("id")

        sim_edges = None
        if n == 0:
            lsh_edges, _hot = minhash_edges_from_sigs(
                new_sigs.select("id", "minhash"), "id", self.cfg, num_partitions
            )
            # same operator as the n>0 branch with an empty old side — one
            # copy of the min-over-window star shape, not two
            nh = new_sigs.select("id", "text_md5")
            exact = incremental_exact_edges(nh, nh.where(F.lit(False)))
            edges = lsh_edges.unionByName(exact)
            if self.use_simhash:
                sim_edges = simhash_edges_from_sigs(
                    new_sigs.select("id", "simhash"), "id", self.cfg, num_partitions
                )
                edges = edges.unionByName(sim_edges)
            labels = connected_components(
                edges.distinct(), vertices=new_ids, pre_deduped=True, **cc_kwargs
            )
        else:
            old_sigs = self.signatures(spark, upto=n)
            old_labels = self.labels(spark)
            lsh_edges, _hot = incremental_minhash_edges(
                new_sigs.select("id", "minhash"),
                old_sigs.select("id", "minhash"),
                self.cfg,
                num_partitions,
            )
            exact = incremental_exact_edges(
                new_sigs.select("id", "text_md5"),
                old_sigs.select("id", "text_md5"),
            )
            edges = lsh_edges.unionByName(exact)
            if self.use_simhash:
                sim_edges = incremental_simhash_edges(
                    new_sigs.select("id", "simhash"),
                    old_sigs.select("id", "simhash"),
                    self.cfg,
                    num_partitions,
                )
                edges = edges.unionByName(sim_edges)
            labels = fold_labels(old_labels, edges.distinct(), new_ids, **cc_kwargs)
        labels.write.mode("overwrite").parquet(self._label_dir(n))
        release_cached_deps(lsh_edges)
        if sim_edges is not None:
            release_cached_deps(sim_edges)
        out = spark.read.parquet(self._label_dir(n))
        n_docs = out.count()
        # count the materialized parquet, not the incoming plan (no recompute)
        expected = int(meta.get("total_docs", 0)) + new_sigs.count()
        if n_docs != expected:
            raise ValueError(
                f"label count {n_docs} != docs ever added {expected}: "
                "duplicate doc ids across increments?"
            )
        self._write_meta(
            {
                "cfg_fp": self.cfg.fingerprint(),
                "use_simhash": self.use_simhash,
                "n_increments": n + 1,
                "total_docs": n_docs,
            }
        )
        # each label snapshot is O(corpus); keep only the current one and
        # its predecessor (crash safety: meta never points at a snapshot
        # that could be mid-delete), prune everything older
        for stale in range(n - 1):
            shutil.rmtree(self._label_dir(stale), ignore_errors=True)
        return out
