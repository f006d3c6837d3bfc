"""Single-query inspection: "show me this doc's duplicate candidates".

Reference parity: ``retrieve_top_k`` + the printed top-k table with
``✓ DUPLICATE`` ground-truth marks
(/root/reference/inference_comparison.py:69-161). The reference scores the
query against EVERY candidate via the dense similarity row; at 10^12 docs
a single-doc lookup must touch only the query's LSH buckets — the corpus
side streams, the query's ~32 band keys and signature are broadcast, so
the lookup is one bucket semi-join + a rescore of the (small) candidate
set. Same ranking semantics: score desc, id asc, self excluded
(reference P6, src/metrics.py:197-200).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig
from .minhash import band_table, estimated_jaccard_col, with_minhash


def retrieve_top_k(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    cfg: DedupConfig | None = None,
    k: int = 20,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(rank, cand_id, est_jaccard) — the query doc's top-k near-dup
    candidates from its LSH buckets. Pass ``sigs`` (id, minhash) to reuse a
    signatures checkpoint instead of re-signing the corpus."""
    cfg = cfg or DedupConfig()
    if sigs is None:
        sigs = with_minhash(docs.select(id_col, text_col), text_col, cfg).select(
            F.col(id_col).alias("id"), "minhash"
        )
    else:
        sigs = sigs.select(F.col(id_col).alias("id"), "minhash")
    bands = band_table(sigs, "id", cfg)
    q_bands = bands.where(F.col("id") == query_id).select("band_key").distinct()
    cand = (
        bands.join(F.broadcast(q_bands), "band_key")
        .where(F.col("id") != query_id)
        .select("id")
        .distinct()
    )
    q_sig = (
        sigs.where(F.col("id") == query_id)
        .select(F.col("minhash").alias("q_minhash"))
    )
    scored = (
        sigs.join(cand, "id")
        .crossJoin(F.broadcast(q_sig))
        .withColumn(
            "est_jaccard",
            estimated_jaccard_col(F.col("minhash"), F.col("q_minhash"), cfg.num_perm),
        )
    )
    # global (un-partitioned) window => single-task sort. Deliberate and
    # safe ONLY here: the input is one doc's bucket candidates (~bands x
    # bucket_cap rows), not a corpus-scale table. Do not copy this pattern
    # into any per-query-fanout path — partition by query id there.
    w = Window.orderBy(F.desc("est_jaccard"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", F.col("id").alias("cand_id"), "est_jaccard")
    )


def format_inspection(
    query_id: int,
    query_text: str | None,
    results: list,
    true_dups: set,
    k: int = 20,
) -> str:
    """Top-k table with ✓ DUPLICATE truth marks
    (≙ print_comparison_results, inference_comparison.py:127-161)."""
    lines = ["=" * 72, f"QUERY DOC: {query_id}", "=" * 72]
    if query_text is not None:
        lines += ["", "--- Query Text ---", query_text[:500], ""]
    lines += [f"--- Known Duplicates: {len(true_dups)} ---",
              ", ".join(map(str, sorted(true_dups))) or "(none)", ""]
    lines += [f"TOP {k} CANDIDATES", "-" * 72,
              f"{'Rank':<6} {'Doc ID':<22} {'Est.Jaccard':<12} {'Duplicate?':<12}",
              "-" * 72]
    found = 0
    for r in results:
        mark = "✓ DUPLICATE" if r["cand_id"] in true_dups else ""
        found += bool(mark)
        lines.append(f"{r['rank']:<6} {r['cand_id']:<22} {r['est_jaccard']:<12.4f} {mark:<12}")
    denom = max(len(true_dups), 1)
    lines += ["-" * 72,
              f"Duplicates found in top-{k}: {found}/{len(true_dups)} ({100.0 * found / denom:.1f}%)",
              "=" * 72]
    return "\n".join(lines)


def inspect_doc(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    cfg: DedupConfig | None = None,
    k: int = 20,
    labels: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> str:
    """End-to-end: retrieve + truth-mark (truth = same cluster in
    ``labels(id, cluster_id)``, when provided) + format."""
    cfg = cfg or DedupConfig()
    results = retrieve_top_k(docs, id_col, text_col, query_id, cfg, k, sigs=sigs).collect()
    true_dups = _true_dups(labels, query_id)
    qt = docs.where(F.col(id_col) == query_id).select(F.col(text_col)).first()
    return format_inspection(query_id, qt[0] if qt else None, results, true_dups, k)


def _true_dups(labels: DataFrame | None, query_id: int) -> set:
    if labels is None:
        return set()
    lab = labels.select(
        F.col(labels.columns[0]).alias("id"), F.col(labels.columns[1]).alias("c")
    )
    q = lab.where(F.col("id") == query_id).select("c")
    return {
        r["id"]
        for r in lab.join(F.broadcast(q), "c").where(F.col("id") != query_id).collect()
    }


def compare_configs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    cfg_a: DedupConfig,
    cfg_b: DedupConfig,
    k: int = 20,
    labels: DataFrame | None = None,
    name_a: str = "CONFIG A",
    name_b: str = "CONFIG B",
) -> str:
    """Side-by-side two-configuration retrieval diff for one query doc
    (≙ reference inference_baseline_vs_trained.py:102-158 comparing
    baseline vs fine-tuned retrieval on the same query): both configs'
    top-k tables with ✓ DUPLICATE marks, then a summary with the found
    counts and the improvement delta. Each side is the same bucket-local
    lookup as ``retrieve_top_k`` — still never an all-pairs scan."""
    true_dups = _true_dups(labels, query_id)

    def table(cfg: DedupConfig, name: str) -> tuple[list[str], int]:
        rows = retrieve_top_k(docs, id_col, text_col, query_id, cfg, k).collect()
        lines = ["=" * 72, f"TOP {k} RESULTS - {name}", "=" * 72,
                 f"{'Rank':<6} {'Doc ID':<22} {'Est.Jaccard':<12} {'Duplicate?':<12}",
                 "-" * 72]
        found = 0
        for r in rows:
            mark = "✓ DUPLICATE" if r["cand_id"] in true_dups else ""
            found += bool(mark)
            lines.append(
                f"{r['rank']:<6} {r['cand_id']:<22} {r['est_jaccard']:<12.4f} {mark:<12}"
            )
        return lines, found

    lines_a, found_a = table(cfg_a, name_a)
    lines_b, found_b = table(cfg_b, name_b)
    denom = max(len(true_dups), 1)
    delta = found_b - found_a
    out = ["=" * 72, f"QUERY DOC: {query_id}", "=" * 72,
           f"--- Known Duplicates: {len(true_dups)} ---",
           ", ".join(map(str, sorted(true_dups)[:20])) or "(none)", ""]
    out += lines_a + [""] + lines_b
    out += ["", "=" * 72, "SUMMARY", "=" * 72,
            f"Total known duplicates: {len(true_dups)}",
            f"Found in top-{k} with {name_a}: {found_a}/{len(true_dups)} ({100.0 * found_a / denom:.1f}%)",
            f"Found in top-{k} with {name_b}: {found_b}/{len(true_dups)} ({100.0 * found_b / denom:.1f}%)",
            f"Improvement ({name_b} vs {name_a}): {delta:+d} duplicates ({100.0 * delta / denom:+.1f}%)",
            "=" * 72]
    return "\n".join(out)
