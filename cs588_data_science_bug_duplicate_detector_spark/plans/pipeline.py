"""End-to-end checkpointed dedup pipeline (north_rule resumability).

Stage graph (each stage checkpoints through TableIO with lineage meta and
is skipped on resume when its input fingerprint matches):

    pages --extract--> documents --sign--> signatures
        --detect--> candidate_edges (exact ∪ minhash ∪ simhash ∪ suffix)
        --cc--> component_labels(url, doc_id, cluster_id)

``doc_id = xxhash64(url)``: deterministic, shuffle-friendly 64-bit key so
every downstream join/group is on a long, never on the url string.
Cluster ids are min-member doc_ids (≙ reference's root-as-cluster-id,
compared as partitions).

The reference's equivalent lifecycle is preprocess_data.py main()
(scan -> cluster -> augment -> sink, SURVEY.md §3.1) — here each arrow is
a lazy DataFrame plan with materialization only at stage checkpoints.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.extract import with_extracted_text
from ..operators.cc import connected_components
from ..operators.exact import exact_dup_edges
from ..operators.minhash import minhash_edges_from_sigs, with_minhash
from ..operators.simhash import simhash_edges_from_sigs, with_simhash
from ..operators.suffix import suffix_edges
from ..sources.tableio import TableIO

ALL_DETECTORS = ("exact", "minhash", "simhash", "suffix")


@dataclass
class PipelineRun:
    labels: DataFrame
    stats: dict = field(default_factory=dict)


def _fingerprint(df: DataFrame, key: str, cfg: DedupConfig, salt: str) -> str:
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({key}))"), F.lit(0)).alias("chk"),
    ).collect()[0]
    return f"{salt}:{cfg.fingerprint()}:{row['n']}:{row['chk']}"


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    cfg: DedupConfig | None = None,
    detectors: tuple = ("exact", "minhash", "simhash"),
    resume: bool = True,
    io: TableIO | None = None,
) -> PipelineRun:
    cfg = cfg or DedupConfig()
    io = io or TableIO(workdir)
    stats: dict = {"stages": {}, "config": cfg.fingerprint(), "detectors": list(detectors)}

    def stage(name: str, input_fp: str, build):
        t0 = time.time()
        if resume and io.valid_checkpoint(name, input_fp):
            stats["stages"][name] = {"resumed": True, "sec": 0.0}
            return io.read(spark, name)
        df = build()
        io.write(df, name)
        out = io.read(spark, name)
        # per-partition lineage metrics (north_rule): row histogram of the
        # checkpoint as written, so a resume can audit balance/skew per stage
        part_rows = [
            r["n"]
            for r in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        n = sum(part_rows)
        io.write_meta(
            name,
            {
                "stage": name,
                "input_fingerprint": input_fp,
                "config_fingerprint": cfg.fingerprint(),
                "rows": n,
                "partitions": {
                    "count": len(part_rows),
                    "min_rows": min(part_rows) if part_rows else 0,
                    "max_rows": max(part_rows) if part_rows else 0,
                },
                "detectors": list(detectors),
            },
        )
        stats["stages"][name] = {"resumed": False, "sec": round(time.time() - t0, 2), "rows": n}
        return out

    # --- stage 1: extract/normalize ---------------------------------------
    pages_fp = _fingerprint(pages, "url", cfg, "pages")

    def build_documents():
        df = pages
        if "html" in df.columns:
            df = with_extracted_text(df, "html", "text")
        return df.select(
            "url",
            F.xxhash64("url").alias("doc_id"),
            "text",
            *(["lang"] if "lang" in df.columns else []),
        )

    documents = stage("documents", pages_fp, build_documents)

    # --- stage 2: signatures ----------------------------------------------
    docs_fp = _fingerprint(documents, "doc_id", cfg, "documents")

    def build_signatures():
        df = documents.select("doc_id", "text")
        if "minhash" in detectors:
            df = with_minhash(df, "text", cfg)
        if "simhash" in detectors:
            df = with_simhash(df, "text")
        return df.drop("text")

    needs_signatures = bool({"minhash", "simhash"} & set(detectors))
    signatures = stage("signatures", docs_fp, build_signatures) if needs_signatures else None

    # --- stage 3: candidate edges -------------------------------------------
    def build_edges():
        parts = []
        if "exact" in detectors:
            parts.append(
                exact_dup_edges(documents, "doc_id", "text").withColumn("detector", F.lit("exact"))
            )
        if "minhash" in detectors:
            e, _hot = minhash_edges_from_sigs(
                signatures.select("doc_id", "minhash"), "doc_id", cfg
            )
            parts.append(e.withColumn("detector", F.lit("minhash")))
        if "simhash" in detectors:
            parts.append(
                simhash_edges_from_sigs(
                    signatures.select("doc_id", "simhash"), "doc_id", cfg
                ).withColumn("detector", F.lit("simhash"))
            )
        if "suffix" in detectors:
            parts.append(
                suffix_edges(documents, "doc_id", "text", cfg).withColumn("detector", F.lit("suffix"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    edges = stage("candidate_edges", docs_fp, build_edges)

    # --- stage 4: connected components -> labels ----------------------------
    edges_fp = _fingerprint(edges, "src", cfg, "edges")

    def build_labels():
        cc = connected_components(
            edges.select("src", "dst").distinct(),
            vertices=documents.select("doc_id"),
        )
        return documents.select("url", "doc_id").join(
            cc.withColumnRenamed("id", "doc_id"), "doc_id"
        )

    labels = stage("component_labels", edges_fp, build_labels)

    with open(os.path.join(workdir, "pipeline_stats.json"), "w") as f:
        json.dump(stats, f, indent=2, sort_keys=True)
    return PipelineRun(labels=labels, stats=stats)
