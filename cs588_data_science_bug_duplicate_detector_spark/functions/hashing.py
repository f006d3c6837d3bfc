"""Deterministic vectorized hashing kernels (numpy/pandas, Arrow-batch side).

These run INSIDE pandas UDFs — the engine's only Python hot path
(SURVEY.md U3: the reference's batched ``model.encode``,
``/root/reference/evaluate.py:71-108``, becomes batched signature
computation). Everything is vectorized over the whole Arrow batch:
one ``pd.util.hash_array`` call over the concatenated shingles of all
rows, then segment reductions with ``np.minimum.reduceat`` /
``np.add.reduceat`` — no per-row Python in the inner loop.

Determinism: pandas' siphash with a pinned 16-byte key + numpy
``default_rng(seed)`` permutations. Stable across processes/machines
(no PYTHONHASHSEED dependence), which the checkpoint/resume contract
requires.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# pd.util.hash_array requires a 16-character key.
_HASH_KEY = "dupdetect-v1-key"

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of an object array of strings -> uint64."""
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


def minhash_perms(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift permutation params; a odd, arithmetic mod 2^64."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    return a, b


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Lowercase alnum tokens per row — vectorized pandas str op."""
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def _segments(token_lists: pd.Series, shingle_k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flatten per-doc k-shingles into one object array + segment offsets.

    Docs shorter than k tokens contribute a single shingle (the whole doc);
    empty docs contribute the empty-string shingle so every segment is
    non-empty (reduceat requirement) and every doc gets a signature.
    """
    shingles: list[str] = []
    counts = np.empty(len(token_lists), dtype=np.int64)
    for i, toks in enumerate(token_lists):
        n = len(toks)
        if n >= shingle_k:
            start = len(shingles)
            shingles.extend(" ".join(toks[j : j + shingle_k]) for j in range(n - shingle_k + 1))
            counts[i] = len(shingles) - start
        elif n:
            shingles.append(" ".join(toks))
            counts[i] = 1
        else:
            shingles.append("")
            counts[i] = 1
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=offsets[1:])
    return np.asarray(shingles, dtype=object), offsets


def char_segments(texts: pd.Series, shingle_k: int) -> tuple[np.ndarray, np.ndarray]:
    """k-CHARACTER sliding shingles (whitespace collapsed, lowercased) —
    the MinHash unit for unsegmented scripts (CJK), where token shingles
    degenerate to zero tokens. Same (flat, offsets) contract as
    ``_segments``; blank docs contribute the empty shingle and are masked
    to NULL signatures upstream."""
    shingles: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        t = " ".join((t or "").lower().split())
        n = len(t)
        if n >= shingle_k:
            start = len(shingles)
            shingles.extend(t[j : j + shingle_k] for j in range(n - shingle_k + 1))
            counts[i] = len(shingles) - start
        else:
            shingles.append(t)  # whole (short or empty) doc
            counts[i] = 1
    offsets = np.zeros(len(counts), dtype=np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=offsets[1:])
    return np.asarray(shingles, dtype=object), offsets


# Shingle-block size for the permutation reduction: hc + hv at 32k shingles
# is 2 x 256 KB — resident in a per-core L2 across all num_perm passes.
# The unblocked loop re-streamed the FULL batch hash array from DRAM once
# per permutation (~7 MB x 128 at 10k-doc Arrow batches = ~1.8 GB of
# traffic per batch per worker): with many concurrent workers the box goes
# memory-bandwidth-bound and ADDING workers made the job slower (measured
# local[32] 2x slower than local[8] on the same 1M-doc corpus). Blocking
# turns that into one DRAM pass over h + the signature writes. The same
# math governs real executors: task slots x per-slot bandwidth is the
# budget at 10^12 docs, and the kernel should spend it once, not 128x.
_REDUCE_BLOCK = 32768


def _blocked_minhash_reduce(
    h: np.ndarray, offsets: np.ndarray, n_docs: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minimum.reduceat passes over document-aligned shingle blocks
    (values are bit-identical to the unblocked reduction — docs are
    independent, blocks split only BETWEEN docs)."""
    num_perm = len(a)
    sig = np.empty((n_docs, num_perm), dtype=np.uint64)
    n = len(h)
    start_doc = 0
    with np.errstate(over="ignore"):
        while start_doc < n_docs:
            lo = int(offsets[start_doc])
            # grow the block to >= _REDUCE_BLOCK shingles, whole docs only
            # (a single mega-doc becomes its own block)
            end_doc = int(np.searchsorted(offsets, lo + _REDUCE_BLOCK, side="left"))
            end_doc = max(end_doc, start_doc + 1)
            hi = int(offsets[end_doc]) if end_doc < n_docs else n
            hc = h[lo:hi]
            offs = offsets[start_doc:end_doc] - lo
            for j in range(num_perm):
                hv = a[j] * hc + b[j]  # wraps mod 2^64 (multiply-shift family)
                sig[start_doc:end_doc, j] = np.minimum.reduceat(hv, offs)
            start_doc = end_doc
    return sig.view(np.int64)


def minhash_signatures_from_segments(
    flat: np.ndarray, offsets: np.ndarray, n_docs: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """Shared reduce: hash the flat shingle array once, then blocked
    minimum.reduceat per permutation (see _blocked_minhash_reduce)."""
    h = hash64(flat)
    return _blocked_minhash_reduce(h, offsets, n_docs, a, b)


def minhash_signatures(
    texts: pd.Series, shingle_k: int, a: np.ndarray, b: np.ndarray,
    token_lists: pd.Series | None = None,
) -> np.ndarray:
    """(n_docs, num_perm) int64 MinHash signature matrix for a batch of texts.

    Pass ``token_lists`` to reuse an existing tokenization (the dual-signature
    path tokenizes once for both kernels)."""
    if token_lists is None:
        token_lists = tokenize_series(texts)
    if len(token_lists) == 0:
        return np.empty((0, len(a)), dtype=np.int64)
    flat, offsets = _segments(token_lists, shingle_k)
    h = hash64(flat)
    return _blocked_minhash_reduce(h, offsets, len(token_lists), a, b)


def shingle_set(text: str, shingle_k: int) -> set:
    """Reference-style eager shingle set for one doc (test oracle / verify)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) >= shingle_k:
        return {" ".join(toks[j : j + shingle_k]) for j in range(len(toks) - shingle_k + 1)}
    return {" ".join(toks)} if toks else {""}


def simhash_signatures(texts: pd.Series, token_lists: pd.Series | None = None) -> np.ndarray:
    """64-bit SimHash per doc (int64 view), vectorized over the batch.

    Token hash bits vote +1/-1 per position; sign of the per-doc sum
    gives the signature bit.
    """
    if token_lists is None:
        token_lists = tokenize_series(texts)
    n = len(token_lists)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    flat: list[str] = []
    counts = np.empty(n, dtype=np.int64)
    for i, toks in enumerate(token_lists):
        if toks:
            flat.extend(toks)
            counts[i] = len(toks)
        else:
            flat.append("")
            counts[i] = 1
    offsets = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(counts[:-1], out=offsets[1:])
    h = hash64(np.asarray(flat, dtype=object))
    # bit matrix via unpackbits on the little-endian byte view: (total, 64)
    # uint8 — 8x smaller than a shifted uint64 intermediate and allocation-
    # bound rather than ALU-bound (the naive h[:,None]>>shifts version made
    # this UDF 7x slower end-to-end).
    bits = np.unpackbits(
        h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )  # column j == bit j of h
    # per-segment row-block sums: measured fastest of the alternatives on
    # (950k, 64) uint8 / 10k segments — 0.12s vs np.add.reduceat(axis=0)
    # 0.26s vs blocked cumsum+endpoint-diff 0.67-1.19s (axis-0 cumsum of a
    # C-order bit matrix is bandwidth-hostile; the short contiguous .sum
    # blocks are SIMD-friendly and stay in L1)
    ones = np.empty((n, 64), dtype=np.int64)
    for i in range(n):
        ones[i] = bits[offsets[i] : offsets[i] + counts[i]].sum(axis=0)
    # majority vote: bit set iff ones > tokens/2 (tie -> 0), ≙ sum(±1) > 0
    majority = (2 * ones) > counts[:, None]
    shifts = np.arange(64, dtype=np.uint64)
    sig = (majority.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
    return sig.view(np.int64)


def dual_signatures(
    texts: pd.Series, shingle_k: int, a: np.ndarray, b: np.ndarray,
    token_lists: pd.Series | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(minhash matrix, simhash vector) for one batch — ONE tokenization
    pass shared by both kernels (tokenize is a large slice of the
    signature phase, and this phase dominates the whole job at scale).
    Pass ``token_lists`` to reuse an existing tokenization."""
    if token_lists is None:
        token_lists = tokenize_series(texts)
    return (
        minhash_signatures(texts, shingle_k, a, b, token_lists=token_lists),
        simhash_signatures(texts, token_lists=token_lists),
    )


def hamming64(x: int, y: int) -> int:
    return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
