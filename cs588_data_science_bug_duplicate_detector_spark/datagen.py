"""Deterministic synthetic Common-Crawl-style pages with planted duplicates.

Generates the input_hint table ``(url, warc_ts, html, text, lang)`` plus a
truth table ``(url, true_cluster_id)`` (min-member-id convention) and a
``truth_spans`` pair table for the suffix/long-shared-span stage.

Planted structure (FIXTURES.md §1):
- exact duplicates (identical text, distinct url)
- near duplicates at controlled SHINGLE-level Jaccard {0.95, 0.9, 0.85, 0.8}
  via contiguous-block token edits (scattered edits would destroy k-shingles)
- a boilerplate "template farm": one large near-identical cluster that
  creates a hot LSH bucket (skew-handling exercise) and a SimHash target
- long-shared-span pairs (>=60-token verbatim span, otherwise different;
  truth for the suffix stage only, NOT near-dup truth)
- low-similarity distractor pairs (J~0.35) that must NOT merge
- singletons

Seeded numpy only — no wall clock, no process randomness. Small scales are
generated driver-side (pandas); ``generate_pages`` parallelizes the Spark
conversion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import DedupConfig
from .functions.text import STOPWORDS

_BASE_TS = pd.Timestamp("2025-01-01 00:00:00")
_LANGS = ["en", "es", "de", "fr"]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
TRUTH_SCHEMA = "url string, true_cluster_id long"
SPANS_SCHEMA = "url_a string, url_b string"


def _vocab(lang: str) -> list[str]:
    return STOPWORDS.get(lang, STOPWORDS["en"]) * 3 + [f"{lang}word{i:04d}" for i in range(4000)]


def _block_edit(tokens: list[str], target_j: float, k: int, rng, vocab) -> list[str]:
    """Replace a centered contiguous block sized so shingle-Jaccard ~= target_j."""
    n = len(tokens)
    s = n - k + 1  # shingle count
    shared = target_j * 2 * s / (1.0 + target_j)
    m = max(1, int(round(s - shared - k + 1)))
    start = int(rng.integers(k, max(k + 1, n - m - k)))
    out = list(tokens)
    out[start : start + m] = [str(v) for v in rng.choice(vocab, size=m)]
    return out


def generate_pages_pdf(
    n_docs: int,
    seed: int = 42,
    cfg: DedupConfig | None = None,
    url_prefix: str = "",
    ts_offset_minutes: int = 0,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    cfg = cfg or DedupConfig()
    rng = np.random.default_rng(seed)
    k = cfg.shingle_k

    docs: list[dict] = []  # {text, lang, source, cluster}
    spans: list[tuple[int, int]] = []  # (doc_idx_a, doc_idx_b)

    def new_text(lang: str, length: int) -> list[str]:
        v = _vocab(lang)
        return [str(t) for t in rng.choice(v, size=length)]

    def add_doc(tokens: list[str], lang: str, source: int, cluster: int | None) -> int:
        idx = len(docs)
        docs.append(
            {"tokens": tokens, "lang": lang, "source": source, "cluster": cluster}
        )
        return idx

    j_levels = [0.95, 0.9, 0.85, 0.8]

    # --- boilerplate template farm: one big near-identical cluster (skew) ---
    farm_size = max(8, n_docs // 25)
    farm_lang = "en"
    template = new_text(farm_lang, 180)
    farm_root = None
    for i in range(farm_size):
        toks = list(template)
        # tiny unique body diff (2 tokens) -> SimHash hamming small, Jaccard ~0.95+
        pos = int(rng.integers(k, len(toks) - k))
        toks[pos] = f"unique{i:05d}"
        idx = add_doc(toks, farm_lang, source=0, cluster=None)
        if farm_root is None:
            farm_root = idx
        docs[idx]["cluster"] = farm_root

    # --- budget the rest ---
    remaining = max(0, n_docs - farm_size)
    n_exact_clusters = remaining // 10       # avg size ~2.5 -> 25% of remaining
    n_near_clusters = remaining // 10
    n_span_pairs = remaining // 20
    n_distractor_pairs = remaining // 40

    ci = 0
    for _ in range(n_exact_clusters):
        lang = _LANGS[ci % len(_LANGS)]
        size = 2 + ci % 3
        base = new_text(lang, int(rng.integers(120, 300)))
        root = add_doc(base, lang, source=1 + ci % 7, cluster=None)
        docs[root]["cluster"] = root
        for _ in range(size - 1):
            add_doc(list(base), lang, source=1 + ci % 7, cluster=root)
        ci += 1

    for _ in range(n_near_clusters):
        lang = _LANGS[ci % len(_LANGS)]
        size = 2 + ci % 3
        base = new_text(lang, int(rng.integers(150, 300)))
        root = add_doc(base, lang, source=1 + ci % 7, cluster=None)
        docs[root]["cluster"] = root
        for m in range(size - 1):
            j = j_levels[(ci + m) % len(j_levels)]
            add_doc(_block_edit(base, j, k, rng, _vocab(lang)), lang, 1 + ci % 7, root)
        ci += 1

    for _ in range(n_span_pairs):
        lang = _LANGS[ci % len(_LANGS)]
        span = new_text(lang, 64)
        a_toks = new_text(lang, 120) + span + new_text(lang, 120)
        b_toks = new_text(lang, 140) + span + new_text(lang, 100)
        a = add_doc(a_toks, lang, 2 + ci % 7, None)
        b = add_doc(b_toks, lang, 2 + ci % 7, None)
        spans.append((a, b))
        ci += 1

    for _ in range(n_distractor_pairs):
        lang = _LANGS[ci % len(_LANGS)]
        base = new_text(lang, 200)
        add_doc(base, lang, 3 + ci % 7, None)
        add_doc(_block_edit(base, 0.35, k, rng, _vocab(lang)), lang, 3 + ci % 7, None)
        ci += 1

    while len(docs) < n_docs:
        lang = _LANGS[len(docs) % len(_LANGS)]
        add_doc(new_text(lang, int(rng.integers(60, 400))), lang, 4 + len(docs) % 9, None)

    docs = docs[:n_docs]

    # --- materialize rows ---
    urls = [
        f"https://src{d['source']}.example.org/p/{url_prefix}{i:08d}"
        for i, d in enumerate(docs)
    ]
    texts = [" ".join(d["tokens"]) for d in docs]
    htmls = [
        (
            f"<html><head><title>src{d['source']}</title></head><body>"
            f"<nav>site src{d['source']} navigation menu home about contact</nav>"
            f"<main>{t}</main>"
            f"<footer>copyright src{d['source']} all rights reserved</footer>"
            "</body></html>"
        ).encode("utf-8")
        for d, t in zip(docs, texts)
    ]
    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [
                _BASE_TS + pd.Timedelta(minutes=ts_offset_minutes + int(i))
                for i in range(len(docs))
            ],
            "html": htmls,
            "text": texts,
            "lang": [d["lang"] for d in docs],
        }
    )
    # cluster roots are always the first (lowest-index) member, so d["cluster"]
    # already follows the min-member-id convention.
    truth = pd.DataFrame(
        [(urls[i], int(d["cluster"])) for i, d in enumerate(docs) if d["cluster"] is not None],
        columns=["url", "true_cluster_id"],
    )
    spans_pdf = pd.DataFrame(
        [(urls[a], urls[b]) for a, b in spans], columns=["url_a", "url_b"]
    )
    return pages, truth, spans_pdf


def generate_pages_distributed(
    spark,
    n_docs: int,
    seed: int = 42,
    cfg: DedupConfig | None = None,
    slice_size: int = 5000,
):
    """Executor-side generation for large corpora: each slice generates its
    own planted structure (clusters never cross slices), urls/timestamps are
    globally unique, and output is deterministic for (n_docs, seed).

    Returns only the pages DataFrame (re-derive truth per slice via
    ``generate_pages_pdf`` with the same slice seed when needed).
    """
    cfg = cfg or DedupConfig()
    n_slices = (n_docs + slice_size - 1) // slice_size
    sizes = [min(slice_size, n_docs - i * slice_size) for i in range(n_slices)]

    def gen(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                s = int(row["id"])
                pages, _t, _s = generate_pages_pdf(
                    sizes[s],
                    seed=seed + s,
                    cfg=cfg,
                    url_prefix=f"s{s:05d}-",
                    ts_offset_minutes=s * slice_size,
                )
                yield pages

    return (
        spark.range(n_slices)
        .repartition(n_slices)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


SKEW_SCHEMA = "url string, text string, lang string"


def generate_skewed_pages_distributed(
    spark,
    n_docs: int,
    farm_frac: float = 0.1,
    seed: int = 42,
    slice_size: int = 5000,
):
    """Adversarial skew corpus: ONE GLOBAL boilerplate farm spanning every
    slice. ``generate_pages_distributed`` plants clusters that never cross
    slices (farm ≤ slice_size/25 members), so it cannot exercise the
    hot-bucket cap/star/salt path at its design point — a single template
    shared by millions of pages (cookie banners, parked domains, mirror
    shells are exactly this in real crawls).

    Doc with global id ``i`` is a farm member iff ``i % round(1/farm_frac)
    == 0``: the template is regenerated IDENTICALLY in every slice from
    ``seed`` alone, and each member differs by one id-seeded token (near-
    identical: shingle-Jaccard ~0.95+, SimHash Hamming ~<=4). Non-members
    are independent filler. Deterministic for (n_docs, farm_frac, seed,
    slice_size). Returns (url, text, lang) only — the dedup job's input
    projection."""
    stride = max(2, int(round(1.0 / farm_frac)))
    n_slices = (n_docs + slice_size - 1) // slice_size
    sizes = [min(slice_size, n_docs - i * slice_size) for i in range(n_slices)]

    def gen(iterator):
        for pdf in iterator:
            for _, row in pdf.iterrows():
                s = int(row["id"])
                template = [
                    str(t)
                    for t in np.random.default_rng(seed).choice(_vocab("en"), size=180)
                ]
                rng = np.random.default_rng(seed + 1_000_003 * (s + 1))
                v = _vocab("en")
                base = s * slice_size
                urls, texts = [], []
                for j in range(sizes[s]):
                    gid = base + j
                    urls.append(f"https://skew.example.org/p/{gid:09d}")
                    if gid % stride == 0:
                        toks = list(template)
                        pos = 5 + gid % (len(toks) - 10)
                        toks[pos] = f"unique{gid:09d}"
                        texts.append(" ".join(toks))
                    else:
                        length = int(rng.integers(60, 400))
                        texts.append(" ".join(str(t) for t in rng.choice(v, size=length)))
                yield pd.DataFrame({"url": urls, "text": texts, "lang": "en"})

    return (
        spark.range(n_slices)
        .repartition(n_slices)
        .mapInPandas(gen, schema=SKEW_SCHEMA)
    )


def generate_pages(spark, n_docs: int, seed: int = 42, cfg: DedupConfig | None = None):
    """Spark DataFrames (pages, truth, spans); pages repartitioned for parallelism."""
    pages_pdf, truth_pdf, spans_pdf = generate_pages_pdf(n_docs, seed=seed, cfg=cfg)
    parts = max(8, min(200, n_docs // 500 + 1))
    pages = spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA).repartition(parts)
    truth = spark.createDataFrame(truth_pdf, schema=TRUTH_SCHEMA)
    spans = (
        spark.createDataFrame(spans_pdf, schema=SPANS_SCHEMA)
        if len(spans_pdf)
        else spark.createDataFrame([], schema=SPANS_SCHEMA)
    )
    return pages, truth, spans
